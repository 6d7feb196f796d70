"""Round-3 phase probe: per-stage cost of the CURRENT bench pipeline.

Measures, on the real chip with readback fences (block_until_ready lies on
this runtime — see docs/STATUS.md):
  - readback RTT floor + jit dispatch overhead
  - host prep (rayflow) per 8k-ray batch
  - wire transfer (device otherwise idle)
  - expand phase per batch
  - split-phase apply, uncapped deposit
  - split-phase apply, compacted deposit (scatter_cap, the bench default)
  - monolithic expand+apply in ONE dispatch (tunnel RTT amortisation probe)
Run SOLO on a rested tunnel: python -u scripts/probe_r3.py
"""

import dataclasses
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
    expand_records_jit, apply_records_jit, integrate_occupancy_jit)
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
    mapper.prime_caps(rays_list)

    # Warm through the real mapper (compiles expand/apply variants + caps).
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
          f"wire={wires_np[0].nbytes/1e6:.2f} MB scatter_cap={cfg.scatter_cap} "
          f"table_k={cfg.table_k}", flush=True)
    print(f"host prep: {t_prep*1e3:.2f} ms/batch", flush=True)

    # Readback RTT floor.
    small = jnp.zeros((8,), jnp.float32)
    fence(small)
    t0 = time.perf_counter()
    for _ in range(10):
        fence(small)
    rtt = (time.perf_counter() - t0) / 10
    print(f"readback RTT: {rtt*1e3:.2f} ms", flush=True)

    # Dispatch overhead: N trivial jit calls chained, one fence.
    tiny = jax.jit(lambda x: x + 1.0)
    y = tiny(small)
    fence(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = tiny(y)
    fence(y)
    t_disp = (time.perf_counter() - t0 - rtt) / 10
    print(f"tiny dispatch: {t_disp*1e3:.2f} ms/call", flush=True)

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
    recs0, _ = expand_records_jit(batches[0], cfg)  # warm
    fence(recs0["key"][:4])
    t0 = time.perf_counter()
    recs = [expand_records_jit(b, cfg)[0] for b in batches]
    fence(recs[-1]["key"][:4])
    t_exp = (time.perf_counter() - t0 - rtt) / N
    print(f"expand: {t_exp*1e3:.2f} ms/batch "
          f"({t_exp/stream*1e9:.2f} ns/record)", flush=True)

    # Split-phase apply, uncapped deposit.  COPY the arena buffers: the
    # apply jits donate their arena argument, and donating the mapper's own
    # arrays deletes them out from under the later end-to-end leg.
    cfg0 = dataclasses.replace(cfg, scatter_cap=0)
    state = {k: jnp.array(v) for k, v in mapper.arena.arrays.items()}
    state, _, _ = apply_records_jit(state, recs[0], batches[0], cfg0)  # warm
    fence(state["occupancy"][:4])
    t0 = time.perf_counter()
    for r, b in zip(recs, batches):
        state, _, _ = apply_records_jit(state, r, b, cfg0)
    fence(state["occupancy"][:4])
    t_split = (time.perf_counter() - t0 - rtt) / N
    print(f"split apply (uncapped): {t_split*1e3:.2f} ms/batch "
          f"({t_split/stream*1e9:.2f} ns/record)", flush=True)

    # Split-phase apply, compacted deposit (the bench default).
    state, _, _ = apply_records_jit(state, recs[0], batches[0], cfg)  # warm
    fence(state["occupancy"][:4])
    t0 = time.perf_counter()
    for r, b in zip(recs, batches):
        state, _, _ = apply_records_jit(state, r, b, cfg)
    fence(state["occupancy"][:4])
    t_cap = (time.perf_counter() - t0 - rtt) / N
    print(f"split apply (compacted): {t_cap*1e3:.2f} ms/batch "
          f"({t_cap/stream*1e9:.2f} ns/record)", flush=True)

    # Monolithic expand+apply in one dispatch (same cfg, compacted deposit).
    try:
        state2 = {k: jnp.array(v) for k, v in mapper.arena.arrays.items()}
        state2, _ = integrate_occupancy_jit(state2, batches[0], cfg)  # warm
        fence(state2["occupancy"][:4])
        t0 = time.perf_counter()
        for b in batches:
            state2, _ = integrate_occupancy_jit(state2, b, cfg)
        fence(state2["occupancy"][:4])
        t_mono = (time.perf_counter() - t0 - rtt) / N
        print(f"monolithic expand+apply: {t_mono*1e3:.2f} ms/batch", flush=True)
    except Exception as e:
        print(f"monolithic expand+apply: FAILED ({type(e).__name__}: {e})", flush=True)

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

    # End-to-end through the mapper, pipelined (the bench's timed loop).
    t0 = time.perf_counter()
    for b in rays_list[:N]:
        mapper.integrate_rays_async(b)
    mapper.flush()
    fence(mapper.arena.arrays["occupancy"][:4])
    t_e2e = (time.perf_counter() - t0) / N
    print(f"end-to-end pipelined: {t_e2e*1e3:.2f} ms/batch "
          f"({N_RAYS/t_e2e/1e3:.0f}k rays/s)", flush=True)


if __name__ == "__main__":
    main()
