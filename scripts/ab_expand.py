"""Same-process A/B: fused expand kernel (OHM_EXPAND) in the NDT and TSDF
integrators, pallas_expand 0 vs 1 on the live backend.

Bench-shape box scenes, warm chained batches, readback-fenced; prints
rays/s per mode plus an arena bit-equality check between modes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import box_scene_rays
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.ndt_map import TpuNdtMap
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
from ohm_tpu.oracle.tsdf import TsdfOptions


def run(kind, mode, batches):
    m = OccupancyMap(resolution=0.2 if kind == "ndt" else 0.1,
                     flags=MapFlag.NONE)
    if kind == "ndt":
        mp = TpuNdtMap(m, capacity=1024)
    else:
        mp = TpuTsdfMap(m, TsdfOptions(), capacity=1024)
    mp.pallas_expand = mode
    for b in batches[:6]:  # warm: sizes + compiles
        mp.integrate_rays(b)
    jax.block_until_ready(mp.arena.arrays["occupancy"])
    float(jnp.ravel(mp.arena.arrays["occupancy"])[0])
    t0 = time.perf_counter()
    for b in batches:
        mp.integrate_rays(b)
    float(jnp.ravel(mp.arena.arrays["occupancy"])[0])
    dt = time.perf_counter() - t0
    n = sum(b.shape[0] // 2 for b in batches)
    arr = {k: np.asarray(v) for k, v in mp.arena.arrays.items()}
    return n / dt, dt / len(batches), arr


def main():
    rng = np.random.default_rng(11)
    nb = int(os.environ.get("NB", 12))
    batches = [box_scene_rays(8192, rng) for _ in range(nb)]
    for kind in ("ndt", "tsdf"):
        res = {}
        for mode in (0, 1):
            rps, ms, arr = run(kind, mode, batches)
            res[mode] = arr
            print(f"{kind} expand={mode}: {rps:,.0f} rays/s "
                  f"({ms*1e3:.2f} ms/batch)", flush=True)
        keys = sorted(set(res[0]) & set(res[1]))
        for k in keys:
            a, b = res[0][k], res[1][k]
            eq = np.array_equal(a.view(np.uint32) if a.dtype == np.float32 else a,
                                b.view(np.uint32) if b.dtype == np.float32 else b)
            print(f"  {kind} layer {k}: bit-equal={eq}", flush=True)


if __name__ == "__main__":
    main()
