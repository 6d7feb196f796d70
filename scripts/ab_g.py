"""Single-process A/B: rayflow compaction group size G=8 vs G=64.

Same tunnel session, interleaved timed blocks (A B A B), readback fences —
the only comparison that survives the axon tunnel's 2-3x state noise.
Run solo: python -u scripts/ab_g.py
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

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
import bench as benchmod

N_RAYS = 8192
N_BATCH = 10


def make_mapper(g):
    os.environ["OHM_RAYFLOW_G"] = str(g)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    return TpuRayMapper(m, capacity=512)


def fence(m):
    return float(jnp.ravel(m.arena.arrays["occupancy"])[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(2024)
    batches = [benchmod.box_scene_rays(N_RAYS, rng) for _ in range(N_BATCH + 4)]
    mappers = {8: make_mapper(8), 64: make_mapper(64)}
    print(f"devices: {jax.devices()}", flush=True)

    # Warm both (compiles + region sets + caps).
    for g, mp in mappers.items():
        os.environ["OHM_RAYFLOW_G"] = str(g)
        for b in batches[:4]:
            mp.integrate_rays(b)
        fence(mp)
        print(f"warmed G={g}: group_cap={getattr(mp, '_cap_cache_rf', '?')}", flush=True)

    results = {8: [], 64: []}
    for round_i in range(3):
        for g in (8, 64):
            mp = mappers[g]
            os.environ["OHM_RAYFLOW_G"] = str(g)
            t0 = time.perf_counter()
            for b in batches[4:4 + N_BATCH]:
                mp.integrate_rays(b)
            fence(mp)
            dt = time.perf_counter() - t0
            rps = N_RAYS * N_BATCH / dt
            results[g].append(rps)
            print(f"round {round_i} G={g}: {rps/1e3:.1f}k rays/s "
                  f"({dt/N_BATCH*1e3:.1f} ms/batch)", flush=True)
    for g in (8, 64):
        print(f"G={g}: best {max(results[g])/1e3:.1f}k median {sorted(results[g])[1]/1e3:.1f}k", flush=True)


if __name__ == "__main__":
    main()
