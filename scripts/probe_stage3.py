"""Round-3 stage breakdown of the LIVE rayflow+fused pipeline on the chip.

Serialized per-stage timings (RTT-subtracted: every fence is a device->host
readback costing one tunnel RTT) + interleaved pipelined blocks sweeping
OHM_COALESCE and OHM_MONOLITH — the two dispatch-count levers.

Run solo on a rested tunnel:  python -u scripts/probe_stage3.py
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
from ohm_tpu.ops.integrate import expand_records_jit


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def make_mapper(**kw):
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    return TpuRayMapper(m, capacity=512, **kw)


def main():
    rng = np.random.default_rng(2024)
    n_rays = 8192
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(20)]
    print(f"devices: {jax.devices()}", flush=True)

    # Warm a mapper fully (compiles + auto caps sized).
    mapper = make_mapper()
    mapper.prime_caps(batches)
    for i in range(6):
        mapper.integrate_rays(batches[i])
    fence(mapper.arena.arrays["occupancy"])
    print(f"warm: row_cap={mapper.row_cap} scatter_cap={mapper.scatter_cap}",
          flush=True)

    # RTT: fence of a tiny resident array.
    tiny = jnp.zeros(8, jnp.float32)
    fence(tiny)
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        fence(tiny)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"fence RTT: median {rtt*1e3:.2f} ms  min {min(rtts)*1e3:.2f}", flush=True)

    # Serialized stages over 6 batches (subtract one RTT per fenced stage).
    t_host = t_xfer = t_exp = t_app = 0.0
    n = 6
    import dataclasses as _dc
    for b in batches[6:6 + n]:
        t0 = time.perf_counter()
        out = mapper._rayflow_setup_host(b, None, None, 0)
        assert out is not None
        wire, cfg, nr = out
        t1 = time.perf_counter()
        dev = jnp.asarray(wire)
        fence(dev[-1:])
        t2 = time.perf_counter()
        batch = {"rayw": dev}
        state = mapper.arena.device_state()
        records, stats = expand_records_jit(batch, cfg)
        fence(records["key"])
        t3 = time.perf_counter()
        # The production gate takes the SEGMENT count (tpu_map.py); the box
        # scene's rayflow wire is unsegmented, so n_rays == n_segments here.
        rc = mapper._fused_row_cap_for(nr, cfg.group_cap)
        if rc:
            from ohm_tpu.ops.integrate import apply_records_fused_jit
            fcfg = _dc.replace(cfg, row_cap=rc)
            new_state, touched, dropped = apply_records_fused_jit(
                state, records, batch, fcfg)
        else:
            from ohm_tpu.ops.integrate import apply_records_jit
            new_state, touched, dropped = apply_records_jit(state, records, batch, cfg)
        fence(new_state["occupancy"])
        t4 = time.perf_counter()
        mapper.arena.update_state(new_state)
        t_host += t1 - t0
        t_xfer += (t2 - t1) - rtt
        t_exp += (t3 - t2) - rtt
        t_app += (t4 - t3) - rtt
    print(f"stages (ms/batch, RTT-subtracted): host {t_host/n*1e3:6.2f}  "
          f"xfer {t_xfer/n*1e3:6.2f}  expand {t_exp/n*1e3:6.2f}  "
          f"apply {t_app/n*1e3:6.2f}  wire {wire.nbytes/1e3:.0f} kB "
          f"({wire.nbytes/n_rays:.1f} B/ray)", flush=True)

    # Pipelined blocks: coalesce x monolith sweep, interleaved reps.
    variants = [("c1", {"OHM_COALESCE": "1"}), ("c4", {"OHM_COALESCE": "4"}),
                ("c8", {"OHM_COALESCE": "8"}), ("c16", {"OHM_COALESCE": "16"}),
                ("c4mono", {"OHM_COALESCE": "4", "OHM_MONOLITH": "1"})]
    mappers = {}
    for name, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        mp = make_mapper()
        mp.prime_caps(batches)
        for i in range(6):
            mp.integrate_rays(batches[i])
        mp.flush()
        fence(mp.arena.arrays["occupancy"])
        mappers[name] = (mp, env)
        for k in env:
            os.environ.pop(k, None)
    results = {name: [] for name, _ in variants}
    for rep in range(3):
        for name, _ in variants:
            mp, env = mappers[name]
            for k, v in env.items():
                os.environ[k] = v
            t0 = time.perf_counter()
            for b in batches:
                mp.integrate_rays_async(b)
            mp.flush()
            fence(mp.arena.arrays["occupancy"])
            dt = time.perf_counter() - t0
            for k in env:
                os.environ.pop(k, None)
            rps = n_rays * len(batches) / dt
            results[name].append(rps)
            print(f"rep {rep} {name:7s}: {dt*1e3:8.1f} ms  {rps/1e3:8.1f}k rays/s",
                  flush=True)
    for name, v in results.items():
        print(f"{name}: best {max(v)/1e3:.1f}k  median {sorted(v)[1]/1e3:.1f}k",
              flush=True)


if __name__ == "__main__":
    main()
