"""Same-process interleaved A/B: fused two-level apply vs split-phase.

Tunnel-state swings are ~2x across hours, so only interleaved blocks in ONE
process are comparable (docs/STATUS.md).  Runs alternating timed blocks of
the occupancy box bench with OHM_FUSED toggled per mapper instance, plus a
fenced transfer-bandwidth probe and per-phase stage timings.

Run solo, on a rested tunnel, in the background:
    python -u scripts/ab_fused.py > /tmp/ab_fused.log 2>&1
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


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def make_mapper(fused: bool):
    os.environ["OHM_FUSED"] = "1" if fused else "0"
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    return TpuRayMapper(m, capacity=512)


def run_block(mapper, batches):
    t0 = time.perf_counter()
    for b in batches:
        mapper.integrate_rays_async(b)
    mapper.flush()
    fence(mapper.arena.arrays["occupancy"])
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(2024)
    n_rays = int(os.environ.get("OHM_BENCH_RAYS", 8192))
    n_batches = 20
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_batches)]

    print(f"devices: {jax.devices()}", flush=True)

    # --- fenced transfer bandwidth (fresh numbers for the wire model) -----
    for mb in (0.125, 0.5, 2.0):
        nbytes = int(mb * 1e6)
        buf = np.random.default_rng(1).integers(0, 255, nbytes, np.uint8)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            fence(d)
            ts.append(time.perf_counter() - t0)
        best = min(ts[1:])
        print(f"xfer {mb:6.3f} MB: best {best*1e3:7.2f} ms "
              f"({mb/best:6.1f} MB/s)", flush=True)

    # --- interleaved A/B ---------------------------------------------------
    mappers = {"split": make_mapper(False), "fused": make_mapper(True)}
    for name, mp in mappers.items():
        mp.prime_caps(batches)
        for i in range(6):  # warmup compiles + sizing batches (4th sizes)
            mp.integrate_rays(batches[i % n_batches])
        fence(mp.arena.arrays["occupancy"])
        print(f"{name}: warm (row_cap={mp.row_cap}, scatter_cap={mp.scatter_cap})",
              flush=True)

    results = {"split": [], "fused": []}
    for rep in range(3):
        for name in ("split", "fused"):
            dt = run_block(mappers[name], batches)
            rps = n_rays * n_batches / dt
            results[name].append(rps)
            print(f"rep {rep} {name}: {dt*1e3:8.1f} ms  {rps/1e3:8.1f}k rays/s",
                  flush=True)
    for name, v in results.items():
        print(f"{name}: best {max(v)/1e3:.1f}k rays/s, "
              f"median {sorted(v)[len(v)//2]/1e3:.1f}k", flush=True)
    for name, mp in mappers.items():
        s = mp.stats
        assert s["missed_updates"] == 0 and s["dropped_updates"] == 0 \
            and s["compaction_dropped"] == 0, (name, s)
    print("stats clean", flush=True)

    # --- batch-size sweep on the fused path --------------------------------
    # The fused deposit removed the super-linear global record sorts, so
    # larger batches may now amortise the per-batch tunnel costs (32k-ray
    # batches previously measured SLOWER than 8k).
    for n2 in (16384,):
        batches2 = [benchmod.box_scene_rays(n2, rng)
                    for _ in range(max(4, n_rays * n_batches // n2))]
        mp2 = make_mapper(True)
        mp2.stream_budget = 1 << 23  # let the bigger batch through the presplit
        mp2.prime_caps(batches2)
        for i in range(6):
            mp2.integrate_rays(batches2[i % len(batches2)])
        fence(mp2.arena.arrays["occupancy"])
        for rep in range(2):
            dt = run_block(mp2, batches2)
            rps = n2 * len(batches2) / dt
            print(f"fused {n2}-ray batches rep {rep}: {dt*1e3:8.1f} ms  "
                  f"{rps/1e3:8.1f}k rays/s", flush=True)


if __name__ == "__main__":
    main()
