"""Microbenchmarks for the apply-phase redesign (round 2).

Measures, on the real TPU chip:
  - lax.sort cost vs shape: one 2M-record sort vs batched smaller sorts
  - associative_scan cost at stream size
  - unique-index scatter cost into the arena
  - random gather + contiguous row-gather costs
  - the live expand/apply phase split of the current pipeline

Run: python scripts/probe_apply.py [--quick]
Each jit is compiled separately (small programs cache reliably through the
remote compile service — see docs/STATUS.md).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    N = 1 << 21  # 2M records
    CAP = 2048 * 32768  # arena ids

    print(f"devices: {jax.devices()}", flush=True)

    keys = jnp.asarray(rng.integers(0, CAP, N, dtype=np.int32))
    payload = jnp.asarray(rng.random(N, dtype=np.float32))

    # --- sort shapes ------------------------------------------------------
    @jax.jit
    def sort_flat(k):
        return jax.lax.sort((k,), num_keys=1)[0]

    @jax.jit
    def sort_flat_payload(k, p):
        return jax.lax.sort((k, p), num_keys=1)

    print(f"sort u32[{N}] keys-only:      {timeit(sort_flat, keys):8.2f} ms", flush=True)
    print(f"sort u32[{N}] + f32 payload:  {timeit(sort_flat_payload, keys, payload):8.2f} ms", flush=True)

    for rows in (16, 64, 256, 1024, 4096):
        cols = N // rows
        kb = keys.reshape(rows, cols)

        @jax.jit
        def sort_batched(k):
            return jax.lax.sort((k,), num_keys=1, dimension=1)[0]

        print(f"sort batched [{rows:5d},{cols:7d}]:  {timeit(sort_batched, kb):8.2f} ms", flush=True)

    # --- scan -------------------------------------------------------------
    @jax.jit
    def seg_scan(k, p):
        first = jnp.concatenate([jnp.array([True]), k[1:] != k[:-1]])

        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        return jax.lax.associative_scan(op, (first, p))

    print(f"assoc_scan 2-tuple [{N}]:     {timeit(seg_scan, keys, payload):8.2f} ms", flush=True)

    # --- scatter / gather -------------------------------------------------
    arena = jnp.zeros(CAP + 1 + N, jnp.uint32)
    uniq_idx = jnp.asarray(
        np.sort(rng.choice(CAP, N, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))

    @jax.jit
    def scatter_unique(a, idx, v):
        return a.at[idx].set(v, unique_indices=True)

    @jax.jit
    def scatter_unique_add(a, idx, v):
        return a.at[idx].add(v, unique_indices=True)

    print(f"scatter.set unique [{N}]:     {timeit(scatter_unique, arena, uniq_idx, vals):8.2f} ms", flush=True)
    print(f"scatter.add unique [{N}]:     {timeit(scatter_unique_add, arena, uniq_idx, vals):8.2f} ms", flush=True)

    @jax.jit
    def gather_random(a, idx):
        return a[idx]

    print(f"gather random [{N}] <- [{CAP}]: {timeit(gather_random, arena, uniq_idx):8.2f} ms", flush=True)

    # row gather: [100k, 64] rows from [32k, 64]
    src = jnp.asarray(rng.random((32768, 64), dtype=np.float32))
    ridx = jnp.asarray(rng.integers(0, 32768, 131072, dtype=np.int32))

    @jax.jit
    def gather_rows(s, i):
        return s[i]

    print(f"row gather [131072,64] <- [32768,64]: {timeit(gather_rows, src, ridx):8.2f} ms", flush=True)

    # dense sweep analogue: elementwise pass over the arena
    @jax.jit
    def dense_sweep(a):
        f = a.view(jnp.float32) if hasattr(a, "view") else a.astype(jnp.float32)
        x = a.astype(jnp.float32)
        return (x * 1.00001 + 1.0).astype(jnp.uint32)

    print(f"dense sweep [{CAP + 1 + N}] u32: {timeit(dense_sweep, arena):8.2f} ms", flush=True)

    if args.quick:
        return

    # --- live pipeline phase split ---------------------------------------
    from ohm_tpu.core.map import OccupancyMap, MapFlag
    from ohm_tpu.mapping.tpu_map import TpuRayMapper
    from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots, compact_batch
    from ohm_tpu.ops.integrate import expand_records_jit, apply_records_jit
    from bench import box_scene_rays

    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=2048)
    rays = box_scene_rays(8192, rng)

    t0 = time.perf_counter()
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)
    mapper.arena.ensure_regions(prepared.region_keys)
    fill_corner_slots(prepared, mapper.arena.table)
    host_ms = (time.perf_counter() - t0) * 1e3
    total = prepared.n_segments
    print(f"host prep: {host_ms:.2f} ms; segments {total} (bucket {prepared.size})", flush=True)

    wire = compact_batch(prepared, 32)
    batch = {k: jnp.asarray(v) for k, v in wire.items()}
    cfg = mapper._config(0)
    state = mapper.arena.device_state()

    records, stats = expand_records_jit(batch, cfg)
    jax.block_until_ready(records["key"])
    print(f"record stream: {records['key'].shape}", flush=True)

    def run_expand(b):
        r, s = expand_records_jit(b, cfg)
        return r["key"]

    print(f"expand phase: {timeit(run_expand, batch, iters=10):8.2f} ms", flush=True)

    # apply phase (non-donated copy each call would skew; measure via loop on
    # fresh state dict handles - donation invalidates, so re-make state)
    def run_apply():
        st = {k: v for k, v in state.items()}
        new_state, touched, _dropped = apply_records_jit(st, records, batch, cfg)
        return touched

    # donation: state arrays get donated; keep an undonated master copy
    master = {k: jnp.array(v, copy=True) for k, v in state.items()}

    for _ in range(3):
        st = {k: jnp.array(v, copy=True) for k, v in master.items()}
        out = apply_records_jit(st, records, batch, cfg)
    jax.block_until_ready(out[1])
    # measure: copy cost included separately
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        st = {k: jnp.array(v, copy=True) for k, v in master.items()}
        out = apply_records_jit(st, records, batch, cfg)
    jax.block_until_ready(out[1])
    apply_ms = (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def just_copy(v):
        return v * 1

    copy_ms = timeit(just_copy, master["occupancy"], iters=10)
    print(f"apply phase (incl state copy): {apply_ms:8.2f} ms (copy ~{copy_ms:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
