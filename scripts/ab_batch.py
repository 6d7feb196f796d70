"""Single-process A/B: 8k vs 32k rays per batch (fixed tunnel overhead
amortisation).  Interleaved timed blocks, readback fences.
Run solo: python -u scripts/ab_batch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
import bench as benchmod

TOTAL = 81920  # rays per timed block


def make(n_rays):
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    pad = 1 << 22 if n_rays <= 8192 else 1 << 24
    return TpuRayMapper(m, capacity=512, scatter_pad=pad)


def fence(mp):
    return float(jnp.ravel(mp.arena.arrays["occupancy"])[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(2024)
    sizes = (8192, 32768)
    mappers = {n: make(n) for n in sizes}
    batches = {n: [benchmod.box_scene_rays(n, rng) for _ in range(TOTAL // n + 2)]
               for n in sizes}
    print(f"devices: {jax.devices()}", flush=True)

    for n in sizes:
        mp = mappers[n]
        for b in batches[n][:2]:
            mp.integrate_rays(b)
        fence(mp)
        print(f"warmed {n}: cap={getattr(mp, '_cap_cache_rf', '?')} "
              f"steps={getattr(mp, '_steps_cache_rf', '?')}", flush=True)

    for round_i in range(3):
        for n in sizes:
            mp = mappers[n]
            k = TOTAL // n
            t0 = time.perf_counter()
            for b in batches[n][2:2 + k]:
                mp.integrate_rays(b)
            fence(mp)
            dt = time.perf_counter() - t0
            print(f"round {round_i} n={n}: {TOTAL/dt/1e3:.1f}k rays/s "
                  f"({dt/k*1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
