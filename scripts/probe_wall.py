"""Decompose the steady-state per-batch period: device-only, transfer-only,
and full pipeline — in ONE process so the numbers are comparable.

Answers the round-4 attribution question directly:
  (a) device+dispatch per batch: dispatch the integrate programs N times on a
      RESIDENT wire (no transfers), fence once.
  (b) transfer-only per batch: device_put N distinct wires back-to-back,
      fence once (submission pipelining included — this is the steady-state
      marginal cost of wire bytes, unlike the one-shot fenced probe which
      conflates RTT).
  (c) full pipeline (integrate_rays_async): the bench number.

If (a)+(b) ~= (c): transfers serialize against compute (round-3 model).
If max(a,b) ~= (c): they overlap (round-2 model) and the wire diet only
matters once transfer > device.

Run solo on a rested tunnel:
    python -u scripts/probe_wall.py > /tmp/probe_wall.log 2>&1
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


def main():
    rng = np.random.default_rng(2024)
    n_rays = int(os.environ.get("OHM_BENCH_RAYS", 8192))
    n_batches = 20
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_batches)]
    print(f"devices: {jax.devices()}", flush=True)

    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512)
    mapper.prime_caps(batches)
    for i in range(6):
        mapper.integrate_rays(batches[i % n_batches])
    fence(mapper.arena.arrays["occupancy"])
    print("warm", flush=True)

    # --- (b) transfer-only: ship N wires, fence once ----------------------
    wires = []
    for b in batches:
        out = mapper._rayflow_setup_host(b, None, None, 0)
        assert out is not None
        wires.append(out[0])
    wire_bytes = wires[0].nbytes
    print(f"wire: {wire_bytes} B/batch = {wire_bytes/n_rays:.1f} B/ray", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        devs = [jax.device_put(w) for w in wires]
        fence(devs[-1])
        dt = time.perf_counter() - t0
        print(f"rep{rep} transfer-only: {dt/n_batches*1e3:7.2f} ms/batch "
              f"({wire_bytes*n_batches/dt/1e6:6.1f} MB/s)", flush=True)
    del devs

    # --- (a) device-only: resident wires, dispatch the real programs ------
    # Re-dispatch through _dispatch_rayflow on already-on-device wires.
    out = mapper._rayflow_setup_host(batches[0], None, None, 0)
    wire, cfg, nr = out
    dev_wires = [jax.device_put(w) for w in wires]
    fence(dev_wires[-1])
    for rep in range(3):
        t0 = time.perf_counter()
        for dw in dev_wires:
            mapper._dispatch_rayflow({"rayw": dw}, cfg, nr, 0)
        fence(mapper.arena.arrays["occupancy"])
        dt = time.perf_counter() - t0
        print(f"rep{rep} device-only:   {dt/n_batches*1e3:7.2f} ms/batch "
              f"({n_rays*n_batches/dt/1e3:6.1f}k rays/s)", flush=True)

    # --- (a2) dispatch-only: trivial program on resident data -------------
    @jax.jit
    def _triv(x):
        return x[:8].astype(jnp.float32) * 2.0

    _ = _triv(dev_wires[0]); fence(_)
    for rep in range(2):
        t0 = time.perf_counter()
        for dw in dev_wires:
            r = _triv(dw)
        fence(r)
        dt = time.perf_counter() - t0
        print(f"rep{rep} dispatch-only: {dt/n_batches*1e3:7.2f} ms/batch", flush=True)

    # --- (c) full pipeline -------------------------------------------------
    for rep in range(3):
        t0 = time.perf_counter()
        for b in batches:
            mapper.integrate_rays_async(b)
        mapper.flush()
        fence(mapper.arena.arrays["occupancy"])
        dt = time.perf_counter() - t0
        print(f"rep{rep} full pipeline: {dt/n_batches*1e3:7.2f} ms/batch "
              f"({n_rays*n_batches/dt/1e3:6.1f}k rays/s)", flush=True)

    # --- (d) overlap probe: transfers WHILE a long device chain runs ------
    # Dispatch the device-only chain (a), then immediately ship all 20 wires,
    # then fence both.  If total ~= max(a_total, b_total): overlapped.
    for rep in range(2):
        t0 = time.perf_counter()
        for dw in dev_wires:
            mapper._dispatch_rayflow({"rayw": dw}, cfg, nr, 0)
        t1 = time.perf_counter()
        devs2 = [jax.device_put(w) for w in wires]
        t2 = time.perf_counter()
        fence(devs2[-1])
        fence(mapper.arena.arrays["occupancy"])
        dt = time.perf_counter() - t0
        print(f"rep{rep} overlap chain: total {dt/n_batches*1e3:7.2f} ms/batch "
              f"(submit compute {(t1-t0)*1e3:.1f} ms, submit xfer "
              f"{(t2-t1)*1e3:.1f} ms)", flush=True)

    # --- host prep cost -----------------------------------------------------
    t0 = time.perf_counter()
    for b in batches:
        out = mapper._rayflow_setup_host(b, None, None, 0)
    dt = time.perf_counter() - t0
    print(f"host prep: {dt/n_batches*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
