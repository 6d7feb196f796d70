"""TSDF throughput A/B (VERDICT r3 item 3: 185k -> 82.5k regression).

Same-process interleaved blocks: per-visit truncation (reference-exact,
default) vs once-per-batch truncation (r2-era semantics), plus an occupancy
mapper block as the same-tunnel yardstick.  Decides whether the r3 drop was
the per-visit composition's device cost or tunnel state.

Run solo:  python -u scripts/ab_tsdf.py > /tmp/ab_tsdf.log 2>&1
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
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
from ohm_tpu.oracle.tsdf import TsdfOptions


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def run_block(mapper, batches):
    t0 = time.perf_counter()
    for b in batches:
        mapper.integrate_rays_async(b)
    mapper.flush()
    fence(mapper.arena.arrays["occupancy"])
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(2024)
    n_rays, n_b = 8192, 20
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_b)]
    print(f"devices: {jax.devices()}", flush=True)

    def make(kind):
        m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        if kind == "occ":
            return TpuRayMapper(m, capacity=512)
        return TpuTsdfMap(m, TsdfOptions(per_visit=kind == "pv"),
                          capacity=512)

    mappers = {"occ": make("occ"), "tsdf_pv": make("pv"),
               "tsdf_batch": make("batch")}
    for name, mp in mappers.items():
        mp.prime_caps(batches)
        for i in range(6):
            mp.integrate_rays(batches[i])
        fence(mp.arena.arrays["occupancy"])
        print(f"{name}: warm (scatter_cap={mp.scatter_cap})", flush=True)

    results = {k: [] for k in mappers}
    for rep in range(3):
        for name, mp in mappers.items():
            dt = run_block(mp, batches)
            rps = n_rays * n_b / dt
            results[name].append(rps)
            print(f"rep {rep} {name:10s}: {dt*1e3:8.1f} ms  "
                  f"{rps/1e3:8.1f}k rays/s", flush=True)
    for name, v in results.items():
        print(f"{name}: best {max(v)/1e3:.1f}k, median "
              f"{sorted(v)[len(v)//2]/1e3:.1f}k rays/s", flush=True)


if __name__ == "__main__":
    main()
