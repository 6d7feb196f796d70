"""A/B slope comparison of apply pipelines, carry-chained (no re-uploads).

The occupancy arena stays device-resident across runs (donated and carried),
so timing windows contain only compute + dispatch.  Interleaved rounds with
medians cancel tunnel drift.

Run: python -u scripts/probe_v4.py
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
from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots, compact_batch
from ohm_tpu.ops.integrate import expand_records_jit, apply_records_jit, apply_delta_jit
import bench as benchmod


class Chain:
    """Carry a device value across timed runs; never re-upload."""

    def __init__(self, step, x0):
        self.step = step
        self.x = x0

    def run(self, n):
        t0 = time.perf_counter()
        for _ in range(n):
            self.x = self.step(self.x)
        np.asarray(jax.device_get(self.x.ravel()[:1]))
        return time.perf_counter() - t0

    def slope(self, n1=4, n2=12):
        t1 = self.run(n1)
        t2 = self.run(n2)
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
    cfg0 = mapper._config(0)
    cfg_cap = dataclasses.replace(cfg0, scatter_cap=1 << 20)
    print(f"devices: {jax.devices()}", flush=True)

    records, _ = expand_records_jit(batch, cfg0)
    records = jax.block_until_ready(records)

    def split_step(occ):
        st = {"occupancy": occ}
        st2, _, _ = apply_records_jit(st, records, batch, cfg0)
        return st2["occupancy"]

    def delta_step(occ):
        with jax.enable_x64(True):
            occ2, _ = apply_delta_jit(occ, records["key"], cfg_cap)
        return occ2

    def exp_step(tch):
        b2 = dict(batch)
        b2["touch"] = tch
        rec, _ = expand_records_jit(b2, cfg0)
        return tch ^ rec["key"][:tch.shape[0]].astype(jnp.uint32)

    c_split = Chain(split_step, mapper.arena.arrays["occupancy"])
    occ2 = jnp.asarray(np.full(mapper.arena.arrays["occupancy"].shape, -0.0, np.float32))
    c_delta = Chain(delta_step, occ2)
    c_exp = Chain(exp_step, batch["touch"])

    # compile warmup
    c_split.run(2)
    c_delta.run(2)
    c_exp.run(2)

    res = {"split": [], "delta": [], "expand": []}
    for rnd in range(5):
        res["split"].append(c_split.slope())
        res["delta"].append(c_delta.slope())
        res["expand"].append(c_exp.slope())
        print(f"round {rnd}: split {res['split'][-1]:7.2f} | delta "
              f"{res['delta'][-1]:7.2f} | expand {res['expand'][-1]:7.2f} ms", flush=True)
    for k, v in res.items():
        print(f"{k}: median {np.median(v):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
