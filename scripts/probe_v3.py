"""Slope-time the delta pipeline stages at bench shapes (quiet TPU needed).

Run: python -u scripts/probe_v3.py
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
from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots, compact_batch
from ohm_tpu.ops.integrate import expand_records_jit, apply_delta_jit
import bench as benchmod


def slope_time(step, init, n1=3, n2=9):
    def run(n):
        x = init() if callable(init) else init
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        np.asarray(jax.device_get(x.ravel()[:1]))
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(2024)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=2048)
    rays = benchmod.box_scene_rays(8192, rng)
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)
    mapper.arena.ensure_regions(prepared.region_keys, host_map=m)
    fill_corner_slots(prepared, mapper.arena.table)
    wire = compact_batch(prepared, 32)
    batch = {k: jnp.asarray(v) for k, v in wire.items()}
    print(f"devices: {jax.devices()}", flush=True)

    import dataclasses
    cfg0 = mapper._config(0)

    # expand
    def exp_step(tch):
        b2 = dict(batch)
        b2["touch"] = tch
        rec, _ = expand_records_jit(b2, cfg0)
        return tch ^ rec["key"][:tch.shape[0]].astype(jnp.uint32)

    print(f"expand slope: {slope_time(exp_step, batch['touch']):8.3f} ms", flush=True)

    records, _ = expand_records_jit(batch, cfg0)
    key = jax.block_until_ready(records["key"])
    occ0 = np.asarray(mapper.arena.arrays["occupancy"])

    for cap, label in ((0, "uncapped"), (1 << 20, "cap=1M")):
        cfg = dataclasses.replace(cfg0, scatter_cap=cap)

        def app_step(occ, cfg=cfg):
            with jax.enable_x64(True):
                occ2, _ = apply_delta_jit(occ, key, cfg)
            return occ2

        t = slope_time(app_step, lambda: jnp.asarray(occ0))
        print(f"apply_delta {label} slope: {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
