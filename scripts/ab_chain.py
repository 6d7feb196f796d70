"""Same-process interleaved A/B: chained mega-dispatch vs per-batch dispatch.

The round-4 steady-state decomposition (scripts/probe_wall.py, docs/PERF.md)
showed each dispatch RPC costs ~5 ms through the tunnel and split-phase pays
2.25 dispatches/batch; integrate_chain collapses a K-batch coalesced group's
2K+1 dispatches into ONE compiled program.  This measures the realised gain
(and the chain program's compile cost, which decides whether OHM_CHAIN stays
default-on for bench).

Run solo, on a rested tunnel, in the background:
    python -u scripts/ab_chain.py > /tmp/ab_chain.log 2>&1
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


def make_mapper(chain: bool):
    os.environ["OHM_CHAIN"] = "1" if chain else "0"
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    return TpuRayMapper(m, capacity=512)


def run_block(mapper, batches, chain: bool):
    os.environ["OHM_CHAIN"] = "1" if chain else "0"
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

    mappers = {"plain": make_mapper(False), "chain": make_mapper(True)}
    for name, mp in mappers.items():
        chain = name == "chain"
        os.environ["OHM_CHAIN"] = "1" if chain else "0"
        mp.prime_caps(batches)
        for i in range(6):  # sizing batches (4th sizes the windows)
            mp.integrate_rays(batches[i % n_batches])
        fence(mp.arena.arrays["occupancy"])
        # compile the async-path programs (incl. the chain program) OUTSIDE
        # the timed reps; the chain program is K batches of expand+apply in
        # one XLA module, a much bigger compile.
        t0 = time.perf_counter()
        run_block(mp, batches[:8], chain)
        print(f"{name}: warm (row_cap={mp.row_cap}, "
              f"scatter_cap={mp.scatter_cap}); first async block "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    results = {"plain": [], "chain": []}
    for rep in range(3):
        for name in ("plain", "chain"):
            dt = run_block(mappers[name], batches, name == "chain")
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


if __name__ == "__main__":
    main()
