"""Probe 3: verify sort really executes + time the sort-join deposit.

Probe 2 showed scatter.add(unique) at ~23 ms for 2M updates (the whole
apply-phase budget) while sorts measured suspiciously near zero.  This probe
(a) validates sort execution by checking results and comparing 8 vs 32
chained iterations, and (b) times a scatter-free "sort-join" deposit that
builds a dense per-touched-region count grid purely with sort + scan +
slicing — the candidate replacement for the unique-index scatter.

Run: python scripts/probe_apply3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def chain_time(step, init, iters, warmup=2):
    x = init
    for _ in range(warmup):
        x = step(x)
    x = jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    x = jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3, x


def main():
    rng = np.random.default_rng(0)
    N = 1 << 21
    R_T = 512              # touched regions per batch (upper bound)
    V = 32768              # voxels per region
    CAP_SLOTS = 2048

    print(f"devices: {jax.devices()}", flush=True)

    # Realistic id profile: ~10% of records in a hot region set, rest uniform.
    slots = np.sort(rng.choice(CAP_SLOTS, R_T, replace=False)).astype(np.int32)
    hot = rng.integers(0, 4, N // 8) * V + rng.integers(0, 512, N // 8)
    cold = rng.integers(0, R_T, N - N // 8) * V + rng.integers(0, V, N - N // 8)
    rec_pos = np.concatenate([hot, cold]).astype(np.int32)  # positions in touched space
    rec_ids = slots[rec_pos // V] * V + (rec_pos % V)       # arena ids
    rec_ids_j = jnp.asarray(rec_ids)

    # --- sort sanity: verify + iters scaling --------------------------------
    @jax.jit
    def sort_roll(k):
        s = jax.lax.sort((k,), num_keys=1)[0]
        # Cheap dependency that preserves randomness: rotate + xor.
        return s ^ jnp.roll(s, 1)

    t8, x8 = chain_time(sort_roll, rec_ids_j, iters=8)
    t32, x32 = chain_time(sort_roll, rec_ids_j, iters=32)
    print(f"sort+roll [2M] 8 iters: {t8:7.3f} ms/iter; 32 iters: {t32:7.3f} ms/iter", flush=True)

    # Verify a single sort result on host.
    s = np.asarray(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])(rec_ids_j))
    assert np.all(np.diff(s) >= 0), "sort result is not sorted!"
    print("sort verified on host", flush=True)

    # --- multi-operand 10M sort ---------------------------------------------
    M = N + R_T * V  # 2M + 16.7M... too big; use R_T=256 scale for the probe
    big_k = jnp.asarray(rng.integers(0, 1 << 26, 10 * (1 << 20), dtype=np.int32))
    big_v = jnp.asarray(rng.integers(0, 1 << 20, 10 * (1 << 20), dtype=np.int32))

    @jax.jit
    def sort3(k, v):
        a, b, c = jax.lax.sort((k, v, v), num_keys=1)
        return a ^ jnp.roll(b, 1), b ^ c

    x = (big_k, big_v)
    for _ in range(2):
        x = sort3(*x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(8):
        x = sort3(*x)
    jax.block_until_ready(x)
    print(f"sort 3-operand [10M]: {(time.perf_counter() - t0) / 8 * 1e3:7.3f} ms/iter", flush=True)

    # --- sort-join deposit ----------------------------------------------------
    # Dense side: R_T * V positions; join records to dense positions by id.
    DN = R_T * V  # 16.7M dense elements
    slots_j = jnp.asarray(slots)

    @jax.jit
    def sort_join_deposit(ids):
        # Dense ids for the touched regions: slot*V + iota.
        dense_ids = (slots_j[:, None] * V
                     + jax.lax.broadcasted_iota(jnp.int32, (R_T, V), 1)).reshape(-1)
        # Keys: (id << 1) | tag, records tag=0 sort before their dense tag=1.
        k_rec = ids << 1  # ids < 2^26, fits i32 shifted
        k_dense = (dense_ids << 1) | 1
        keys = jnp.concatenate([k_rec, k_dense])
        val = jnp.concatenate([jnp.ones((ids.shape[0],), jnp.int32),
                               jnp.zeros((DN,), jnp.int32)])
        pos = jnp.concatenate([jnp.full((ids.shape[0],), 1 << 30, jnp.int32),
                               jax.lax.broadcasted_iota(jnp.int32, (DN, 1), 0).squeeze(-1)])
        ks, vs, ps = jax.lax.sort((keys, val, pos), num_keys=1)
        ids_only = ks >> 1
        first = jnp.concatenate([jnp.array([True]), ids_only[1:] != ids_only[:-1]])

        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        _, totals = jax.lax.associative_scan(op, (first, vs))
        # Bring dense elements back to position order: sort by pos.
        ps2, t2 = jax.lax.sort((ps, totals), num_keys=1)
        pending = t2[:DN]
        return pending.reshape(R_T, V)

    # correctness once
    pending = np.asarray(sort_join_deposit(rec_ids_j))
    expect = np.zeros(R_T * V, np.int64)
    np.add.at(expect, rec_pos, 1)
    assert np.array_equal(pending.reshape(-1), expect), "sort-join deposit wrong!"
    print("sort-join deposit verified", flush=True)

    @jax.jit
    def deposit_chain(ids):
        p = sort_join_deposit.__wrapped__(ids)
        # dependency: perturb ids with a value from pending
        return (ids + p[0, 0]) % jnp.int32(CAP_SLOTS * V)

    t, _ = chain_time(deposit_chain, rec_ids_j, iters=8)
    print(f"sort-join deposit [2M rec -> {R_T}x{V}]: {t:7.3f} ms/iter", flush=True)

    # --- row gather / row scatter over the arena ------------------------------
    occ2d = jnp.zeros((CAP_SLOTS, V), jnp.float32)

    @jax.jit
    def row_roundtrip(occ):
        rows = occ[slots_j]                       # [R_T, V] row gather
        rows = rows + 1.0
        return occ.at[slots_j].set(rows, unique_indices=True)

    t, _ = chain_time(row_roundtrip, occ2d, iters=8)
    print(f"row gather+scatter [{R_T}x{V}] f32: {t:7.3f} ms/iter", flush=True)

    # --- small scatter for cost model ----------------------------------------
    small_idx = jnp.asarray(np.sort(rng.choice(CAP_SLOTS * V, 1 << 18, replace=False)).astype(np.int32))
    small_val = jnp.asarray(rng.integers(0, 255, 1 << 18, dtype=np.uint32))
    arena = jnp.zeros(CAP_SLOTS * V, jnp.uint32)

    @jax.jit
    def small_scatter(a):
        return a.at[small_idx].add(small_val, unique_indices=True)

    t, _ = chain_time(small_scatter, arena, iters=8)
    print(f"scatter.add unique [262k]: {t:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
