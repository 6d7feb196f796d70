"""On-chip A/B: fused expand kernel (ops.expand_pallas) vs the XLA chain.

Times expand_records_jit end-to-end (walk + resolve + group compaction) on
the bench box scene at bench shapes, pallas_expand 0 vs 1, readback-fenced
and chained; also checks key equality on chip.
"""

import os
import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import box_scene_rays
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops.integrate import expand_records_jit


def main():
    rng = np.random.default_rng(2024)
    rays = box_scene_rays(int(os.environ.get("N", 8192)), rng)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp = TpuRayMapper(m, capacity=512)
    wire, cfg, n_rays = mp._rayflow_setup_host(rays, None, None, 0)
    batch = {"rayw": jnp.asarray(wire)}
    print("n_rays", n_rays, "S", cfg.max_steps, "gcap", cfg.group_cap,
          "G", cfg.group_size, "K", cfg.table_k, flush=True)

    outs = {}
    for mode in (0, 1):
        c = dataclasses.replace(cfg, pallas_expand=mode)
        t0 = time.perf_counter()
        out, st = expand_records_jit(batch, c)
        np.asarray(out["key"][:8])
        print(f"mode {mode}: first call (compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        outs[mode] = np.asarray(out["key"])
        # Timed: chain 20 dispatches, fence with readback.
        reps = 20
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            out, st = expand_records_jit(batch, c)
            acc = out["key"] if acc is None else acc ^ out["key"]
        np.asarray(acc[:8])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"mode {mode}: {dt:.2f} ms/call", flush=True)

    eq = np.array_equal(outs[0], outs[1])
    print("keys equal on chip:", eq)
    if not eq:
        d = np.flatnonzero(outs[0] != outs[1])
        print("mismatches", len(d), "first", d[:5],
              outs[0][d[:5]], outs[1][d[:5]])


if __name__ == "__main__":
    main()
