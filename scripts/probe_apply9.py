"""Stage-level ablation of the split apply (10.8 ms at 1.19 M records).

Times nested prefixes of the apply pipeline as separate jits on identical
resident records; differences give per-stage costs:
  A sort(key)                      — the global record sort
  B A + position-diff counts       — blocked cummax/segsum reduce
  C B + unique scatter             — the pending-plane deposit
  D C + dense occupancy sweep      — full apply (should ~match apply-only)
Also E: the dense sweep alone on a precomputed pending plane, and the same
ladder at capacity 256 to test target-size scaling.

Run solo:  python -u scripts/probe_apply9.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp

import bench as benchmod
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops.integrate import (_occupancy_sweep, _unique_scatter_indices,
                                   expand_records_jit, sorted_hit_miss_counts)


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

    out = mapper._rayflow_setup_host(batches[0], None, None, 0)
    wire, cfg, nr = out
    batch = {"rayw": jnp.asarray(wire)}
    records, _ = expand_records_jit(batch, cfg)
    key = records["key"]
    fence(key)
    occ = jnp.copy(mapper.arena.device_state()["occupancy"])
    print(f"stream {key.shape[0]} records; arena {occ.shape[0]} elems",
          flush=True)

    @jax.jit
    def stage_a(key):
        return jax.lax.sort(key)

    @jax.jit
    def stage_b(key):
        key_s = jax.lax.sort(key)
        ids, first, last, n_hit, n_miss = sorted_hit_miss_counts(key_s)
        return ids, last, n_hit, n_miss

    @functools.partial(jax.jit, static_argnames=("c",))
    def stage_c(key, occ, c):
        key_s = jax.lax.sort(key)
        ids, first, last, n_hit, n_miss = sorted_hit_miss_counts(key_s)
        capf = jnp.float32(65535.0)
        packed = ((jnp.minimum(n_hit, capf).astype(jnp.uint32) << 16)
                  | jnp.minimum(n_miss, capf).astype(jnp.uint32))
        real_last = last & (ids != c.sentinel)
        packed = jnp.where(real_last, packed, jnp.uint32(0))
        idx = _unique_scatter_indices(ids, real_last, c)
        pending = jnp.zeros(occ.shape, jnp.uint32).at[idx].set(
            packed, unique_indices=True)
        return pending

    @functools.partial(jax.jit, static_argnames=("c",))
    def stage_d(key, occ, c):
        pending = stage_c.__wrapped__(key, occ, c)
        return _occupancy_sweep(occ, pending, c)

    @functools.partial(jax.jit, static_argnames=("c",))
    def stage_e(occ, pending, c):
        return _occupancy_sweep(occ, pending, c)

    pending0 = stage_c(key, occ, cfg)
    fence(pending0)

    def timeit(label, fn, *args, reps=3):
        r = fn(*args)
        fence(r[0] if isinstance(r, tuple) else r)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            for _i in range(n_b):
                r = fn(*args)
            fence(r[0] if isinstance(r, tuple) else r)
            dt = (time.perf_counter() - t0) / n_b
            best = dt if best is None else min(best, dt)
        print(f"  {label}: {best*1e3:6.2f} ms", flush=True)
        return best

    timeit("A sort(key)           ", stage_a, key)
    timeit("B + count reduce      ", stage_b, key)
    timeit("C + unique scatter    ", stage_c, key, occ, cfg)
    timeit("D + dense sweep (full)", stage_d, key, occ, cfg)
    timeit("E sweep alone         ", stage_e, occ, pending0, cfg)


if __name__ == "__main__":
    main()
