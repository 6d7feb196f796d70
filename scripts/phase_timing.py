"""Per-stage timing of the live integrate pipeline on the real chip.

Serialized stage timings (each stage blocked) + the true pipelined loop,
to show what overlaps and what doesn't.  Also reports per-batch touched
voxel counts to size TpuRayMapper(scatter_cap=...).

Run: python -u scripts/phase_timing.py
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


def main():
    rng = np.random.default_rng(2024)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=2048)
    batches = [benchmod.box_scene_rays(8192, rng) for _ in range(12)]
    cfg = mapper._config(0)
    print(f"devices: {jax.devices()}", flush=True)

    # Warm up compiles + region set.
    for b in batches[:3]:
        mapper.integrate_rays(b)
    jax.block_until_ready(mapper.arena.arrays["occupancy"])

    # Stage-by-stage (serialized, n=6 batches).
    t_prep = t_xfer = t_exp = t_app = 0.0
    touched = []
    for b in batches[3:9]:
        t0 = time.perf_counter()
        prepared = prepare_ray_batch(m, b, segment_length=mapper.segment_length)
        mapper.arena.ensure_regions(prepared.region_keys, host_map=m)
        fill_corner_slots(prepared, mapper.arena.table)
        wire = compact_batch(prepared, 32)
        t1 = time.perf_counter()
        batch = {k: jnp.asarray(v) for k, v in wire.items()}
        jax.block_until_ready(batch)
        t2 = time.perf_counter()
        records, stats = expand_records_jit(batch, cfg)
        jax.block_until_ready(records)
        t3 = time.perf_counter()
        with jax.enable_x64(True):
            occ, dstats = apply_delta_jit(mapper.arena.arrays["occupancy"], records["key"], cfg)
        occ = jax.block_until_ready(occ)
        t4 = time.perf_counter()
        mapper.arena.arrays["occupancy"] = occ
        t_prep += t1 - t0
        t_xfer += t2 - t1
        t_exp += t3 - t2
        t_app += t4 - t3
        touched.append(int(dstats["touched"]))
    n = 6
    print(f"host prep: {t_prep/n*1e3:7.2f} ms  transfer: {t_xfer/n*1e3:7.2f} ms  "
          f"expand: {t_exp/n*1e3:7.2f} ms  apply: {t_app/n*1e3:7.2f} ms", flush=True)
    print(f"records/batch: {batches[0].shape[0]//2*1} rays -> key size "
          f"{int(np.prod(jnp.shape(expand_records_jit(batch, cfg)[0]['key'])))}", flush=True)
    print(f"touched voxels/batch: {touched}", flush=True)

    # True pipelined loop (like bench).
    t0 = time.perf_counter()
    for b in batches[3:9]:
        mapper.integrate_rays(b)
    jax.block_until_ready(mapper.arena.arrays["occupancy"])
    print(f"pipelined loop: {(time.perf_counter()-t0)/n*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
