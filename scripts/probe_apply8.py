"""Apply-phase ablation: how much of the 12.2 ms apply-only time
(probe_resident round 4) is the compacted-deposit scatter WINDOW?

The unique scatter costs ~5.5 ns per WINDOW element every batch (round-2
probes), and the auto-sized window is scatter_cap = pow2 >= 2*touched — the
box bench sizes it to 2 M for ~0.7-1 M touched voxels, i.e. the scatter
alone models out to ~11 ms.  This times the SPLIT apply under different
static windows on identical resident records, plus the fused variant, to
decide the window policy (headroom 2x vs 1.25x) and the fused default.

Run solo:  python -u scripts/probe_apply8.py
"""

import dataclasses as dc
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
from ohm_tpu.ops.integrate import (apply_records_fused_jit, apply_records_jit,
                                   expand_records_jit)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    rng = np.random.default_rng(2024)
    n_rays, n_b = 8192, 20
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_b)]
    print(f"devices: {jax.devices()}", flush=True)

    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512)
    mapper.prime_caps(batches)
    for i in range(6):
        mapper.integrate_rays(batches[i])
    fence(mapper.arena.arrays["occupancy"])
    print(f"warm: row_cap={mapper.row_cap} scatter_cap={mapper.scatter_cap}",
          flush=True)

    out = mapper._rayflow_setup_host(batches[0], None, None, 0)
    assert out is not None
    wire, cfg, nr = out
    dev = jnp.asarray(wire)
    batch = {"rayw": dev}
    records, stats = expand_records_jit(batch, cfg)
    fence(records["key"])
    state = mapper.arena.device_state()
    n_rec = int(records["key"].shape[0])
    print(f"stream: {n_rec} records ({n_rec/n_rays:.0f}/ray)", flush=True)

    def time_apply(fn, acfg, label, reps=3):
        # compile
        st = {k: jnp.copy(v) for k, v in state.items()}
        st, touched, dropped = fn(st, records, batch, acfg)
        fence(st["occupancy"])
        print(f"  {label}: touched={int(touched)} dropped={int(dropped)}",
              flush=True)
        for _ in range(reps):
            st = {k: jnp.copy(v) for k, v in state.items()}
            fence(st["occupancy"])
            t0 = time.perf_counter()
            for _i in range(n_b):
                st, touched, dropped = fn(st, records, batch, acfg)
            fence(st["occupancy"])
            dt = (time.perf_counter() - t0) / n_b
            print(f"  {label}: {dt*1e3:6.2f} ms/apply", flush=True)

    for cap in (mapper.scatter_cap, 1 << 20, (1 << 20) + (1 << 19), 0):
        acfg = dc.replace(cfg, scatter_cap=cap)
        time_apply(apply_records_jit, acfg, f"split cap={cap}")

    rc = mapper._fused_row_cap_for(n_rays, cfg.group_cap)
    if rc:
        fcfg = dc.replace(cfg, row_cap=rc, scatter_cap=mapper.scatter_cap)
        time_apply(apply_records_fused_jit, fcfg, f"fused rc={rc}")
        fcfg2 = dc.replace(cfg, row_cap=rc, scatter_cap=1 << 20)
        time_apply(apply_records_fused_jit, fcfg2, f"fused rc={rc} cap=1M")


if __name__ == "__main__":
    main()
