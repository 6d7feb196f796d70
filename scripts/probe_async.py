"""Instrument the async pipelined loop: time every _integrate_group call,
its group size, and which dispatch route it took (chain / stacked / single).
Same-process interleaved chain on/off comparison.

Run solo:  python -u scripts/probe_async.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import bench as benchmod
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping import tpu_map as tm
from ohm_tpu.mapping.tpu_map import TpuRayMapper


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


events = []

_orig_group = TpuRayMapper._integrate_group
_orig_chain = TpuRayMapper._dispatch_chain
_orig_ray = TpuRayMapper._dispatch_rayflow


def timed_group(self, items):
    t0 = time.perf_counter()
    _orig_group(self, items)
    events.append(("group", len(items), time.perf_counter() - t0))


def timed_chain(self, pending):
    t0 = time.perf_counter()
    _orig_chain(self, pending)
    events.append(("chain", len(pending), time.perf_counter() - t0))


def timed_ray(self, batch, cfg, n_rays, fl):
    t0 = time.perf_counter()
    out = _orig_ray(self, batch, cfg, n_rays, fl)
    events.append(("dispatch", 1, time.perf_counter() - t0))
    return out


TpuRayMapper._integrate_group = timed_group
TpuRayMapper._dispatch_chain = timed_chain
TpuRayMapper._dispatch_rayflow = timed_ray


def run(chain: str, n_b=40, n_rays=8192):
    os.environ["OHM_CHAIN"] = chain
    rng = np.random.default_rng(2024)
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_b)]
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512)
    mapper.prime_caps(batches)
    for i in range(6):
        mapper.integrate_rays(batches[i])
    fence(mapper.arena.arrays["occupancy"])
    events.clear()
    t0 = time.perf_counter()
    for b in batches:
        mapper.integrate_rays_async(b)
    mapper.flush()
    fence(mapper.arena.arrays["occupancy"])
    dt = time.perf_counter() - t0
    sizes = {}
    for kind, n, t in events:
        sizes.setdefault((kind, n), []).append(t * 1e3)
    print(f"chain={chain}: {dt*1e3:8.1f} ms total "
          f"({n_rays*n_b/dt/1e3:7.1f}k rays/s)", flush=True)
    for (kind, n), ts in sorted(sizes.items()):
        ts = np.array(ts)
        print(f"  {kind:9s} size={n}: x{len(ts):3d}  med {np.median(ts):7.1f} "
              f"max {ts.max():7.1f} ms", flush=True)


print(f"devices: {jax.devices()}", flush=True)
for rep in range(2):
    for chain in ("0", "1"):
        run(chain)
