"""Round-3 phase probe: per-stage cost of the CURRENT bench pipeline.

Measures, on the real chip with readback fences (block_until_ready lies on
this runtime — see docs/STATUS.md):
  - readback RTT floor
  - host prep (rayflow) per 8k-ray batch
  - wire transfer (device otherwise idle)
  - expand phase per batch
  - expand + delta apply per batch
  - expand + split-phase apply per batch
Run SOLO on a rested tunnel: python -u scripts/probe_r3.py
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
from ohm_tpu.ops.integrate import (
    expand_records_jit, apply_records_jit, apply_delta_jit, delta_path_ok)
import bench as benchmod

N_RAYS = 8192
N = 6


def fence(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(2024)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512, scatter_cap=1 << 19)
    rays_list = [benchmod.box_scene_rays(N_RAYS, rng) for _ in range(N + 4)]
    print(f"devices: {jax.devices()}", flush=True)

    # Warm through the real mapper (compiles expand/delta variants + caps).
    for b in rays_list[:4]:
        mapper.integrate_rays(b)
    fence(mapper.arena.arrays["occupancy"])

    # Host-side setups for the measured batches (prep timed here, solo).
    t0 = time.perf_counter()
    setups = [mapper._rayflow_setup(b, None, None, 0) for b in rays_list[4:4 + N]]
    t_prep = (time.perf_counter() - t0) / N
    cfg = setups[0][1]
    wires_np = [np.asarray(s[0]["rayw"]) for s in setups]
    stream = (N_RAYS // cfg.group_size) * cfg.group_cap
    print(f"cfg: group_size={cfg.group_size} group_cap={cfg.group_cap} "
          f"stream={stream} ({stream/N_RAYS:.0f} rec/ray) "
          f"wire={wires_np[0].nbytes/1e6:.2f} MB scatter_cap={cfg.scatter_cap}",
          flush=True)
    print(f"host prep: {t_prep*1e3:.2f} ms/batch", flush=True)

    # Readback RTT floor.
    small = jnp.zeros((8,), jnp.float32)
    fence(small)
    t0 = time.perf_counter()
    for _ in range(10):
        fence(small)
    rtt = (time.perf_counter() - t0) / 10
    print(f"readback RTT: {rtt*1e3:.2f} ms", flush=True)

    # Wire transfer, device idle: asarray is async; fence on the LAST buffer
    # only (prior transfers must have completed in order).
    t0 = time.perf_counter()
    bufs = [jnp.asarray(w) for w in wires_np]
    fence(bufs[-1][:4])
    t_xfer = (time.perf_counter() - t0 - rtt) / N
    print(f"wire transfer (idle): {t_xfer*1e3:.2f} ms/batch "
          f"({wires_np[0].nbytes/1e6/max(t_xfer,1e-9):.0f} MB/s)", flush=True)
    batches = [{"rayw": b} for b in bufs]

    # Expand-only chain.
    t0 = time.perf_counter()
    recs = [expand_records_jit(b, cfg)[0] for b in batches]
    for r in recs:
        pass
    fence(recs[-1]["key"][:4])
    t_exp = (time.perf_counter() - t0 - rtt) / N
    print(f"expand: {t_exp*1e3:.2f} ms/batch "
          f"({t_exp/stream*1e9:.2f} ns/record)", flush=True)

    # Delta apply chain (uses precomputed records; donates occupancy).
    assert delta_path_ok(cfg), "probe expects the delta path to be valid"
    occ = mapper.arena.arrays["occupancy"]
    t0 = time.perf_counter()
    for r in recs:
        with jax.enable_x64(True):
            occ, _ = apply_delta_jit(occ, r["key"], cfg)
    fence(occ[:4])
    t_delta = (time.perf_counter() - t0 - rtt) / N
    mapper.arena.arrays["occupancy"] = occ
    print(f"delta apply: {t_delta*1e3:.2f} ms/batch "
          f"({t_delta/stream*1e9:.2f} ns/record)", flush=True)

    # Split-phase apply chain (donates full state).
    cfg0 = mapper._config(0, group_cap=cfg.group_cap,
                          max_steps=cfg.max_steps, group_size=cfg.group_size,
                          table_k=cfg.table_k, walk_cap=cfg.walk_cap)
    import dataclasses
    cfg0 = dataclasses.replace(cfg0, scatter_cap=0)
    state = dict(mapper.arena.arrays)
    # warm compile
    state, _ = apply_records_jit(state, recs[0], batches[0], cfg0)
    fence(state["occupancy"][:4])
    t0 = time.perf_counter()
    for r, b in zip(recs, batches):
        state, _ = apply_records_jit(state, r, b, cfg0)
    fence(state["occupancy"][:4])
    t_split = (time.perf_counter() - t0 - rtt) / N
    print(f"split apply: {t_split*1e3:.2f} ms/batch "
          f"({t_split/stream*1e9:.2f} ns/record)", flush=True)

    # Transfer while the device is busy: queue N expand dispatches, then
    # immediately time N transfers of fresh wires, fence everything.
    fresh = [np.array(w) for w in wires_np]
    pend = [expand_records_jit(b, cfg)[0] for b in batches]
    t0 = time.perf_counter()
    bufs2 = [jnp.asarray(w) for w in fresh]
    fence(bufs2[-1][:4])
    t_busy = time.perf_counter() - t0
    fence(pend[-1]["key"][:4])
    print(f"transfer while busy: {t_busy/N*1e3:.2f} ms/batch (incl shared fence)",
          flush=True)


if __name__ == "__main__":
    main()
