"""Probe 4: measure the primitives for the scatter-free apply redesign.

Probe 2/3 established:
  - single-key i32 lax.sort is near-free (fast path, ~0.01 ms at 2M)
  - multi-operand sorts are catastrophic (42 ms at 10M x 3 operands)
  - scatter.add(unique) costs ~11 ns/element (23 ms at 2M) - the bottleneck

Candidate redesign: single-key sorts with payloads PACKED INTO THE KEY
(i64 = 32-bit id | 32-bit payload), neighbour/blocked-scan segment math, and
a sort-join deposit into a compacted [R_T, V] dense space - no scatters, no
gathers, no multi-operand sorts anywhere.

This probe measures, stage by stage (each its own small jit):
  1. i64 single-key sort at 2M / 10M / 18.7M
  2. i32 single-key sort at 10M (scaling reference)
  3. row-sort [32k, 128] i32 and i64 single-key (expand-phase shape)
  4. blocked 2D cumsum+cummax at 2M vs lax.associative_scan 3-operand
  5. dense sweep (occupancy apply math) over 8.4M
  6. contiguous row gather+scatter [256, 32768] from a [2048, 32768] arena
  7. scatter.add(unique) at 2M for confirmation

Run: python -u scripts/probe_apply4.py [--stage N]
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


def chain_time(step, init, iters=16, warmup=2):
    x = init
    for _ in range(warmup):
        x = step(x) if not isinstance(x, tuple) else step(*x)
    x = jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x) if not isinstance(x, tuple) else step(*x)
    x = jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3, x


def blocked_cumsum(x):
    """Cumsum via 2D block decomposition: log-depth shifts inside rows +
    small inter-row prefix.  x: [N] f32, N = R*C."""
    N = x.shape[0]
    C = 1024
    R = N // C
    x2 = x.reshape(R, C)
    # intra-row inclusive cumsum by log-shifts
    y = x2
    shift = 1
    while shift < C:
        y = y + jnp.pad(y, ((0, 0), (shift, 0)))[:, :C]
        shift *= 2
    row_tot = y[:, -1]
    # exclusive prefix over rows (R is small: 2k..16k) - same log trick
    r = row_tot
    shift = 1
    while shift < R:
        r = r + jnp.pad(r, (shift, 0))[:R]
        shift *= 2
    row_prefix = r - row_tot
    return (y + row_prefix[:, None]).reshape(-1)


def blocked_cummax(x):
    N = x.shape[0]
    C = 1024
    R = N // C
    x2 = x.reshape(R, C)
    y = x2
    shift = 1
    NEG = jnp.int32(-(1 << 30))
    while shift < C:
        y = jnp.maximum(y, jnp.pad(y, ((0, 0), (shift, 0)), constant_values=NEG)[:, :C])
        shift *= 2
    row_tot = y[:, -1]
    r = row_tot
    shift = 1
    while shift < R:
        r = jnp.maximum(r, jnp.pad(r, (shift, 0), constant_values=NEG)[:R])
        shift *= 2
    row_prefix = jnp.concatenate([jnp.full((1,), NEG), r[:-1]])
    return jnp.maximum(y, row_prefix[:, None]).reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0, help="run only stage N (0=all)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    N2M = 1 << 21
    N10M = 10 << 20
    R_T, V = 256, 32768
    DN = R_T * V           # 8.4M compact dense space
    NM = DN + N2M          # merged stream ~10.5M

    def stage_on(n):
        return args.stage in (0, n)

    # ---- 1: i64 single-key sorts ------------------------------------------
    if stage_on(1):
        for n, label in ((N2M, "2M"), (N10M, "10M"), (NM, "10.5M"), (2 * NM, "21M")):
            k0 = jnp.asarray(rng.integers(0, 1 << 56, n, dtype=np.int64))

            @jax.jit
            def sort_i64(k):
                s = jax.lax.sort((k,), num_keys=1)[0]
                return s ^ jnp.roll(s, 1)

            t, _ = chain_time(sort_i64, k0, iters=8)
            print(f"sort i64 1-key [{label}]: {t:8.3f} ms/iter", flush=True)
            # verify once
            if n == N2M:
                s = np.asarray(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])(k0))
                assert np.all(np.diff(s) >= 0)
                print("  i64 sort verified", flush=True)

    # ---- 2: i32 single-key sort at 10M -------------------------------------
    if stage_on(2):
        k0 = jnp.asarray(rng.integers(0, 1 << 30, N10M, dtype=np.int32))

        @jax.jit
        def sort_i32(k):
            s = jax.lax.sort((k,), num_keys=1)[0]
            return s ^ jnp.roll(s, 1)

        t, _ = chain_time(sort_i32, k0, iters=8)
        print(f"sort i32 1-key [10M]: {t:8.3f} ms/iter", flush=True)

    # ---- 3: row sorts (expand-walk shape) -----------------------------------
    if stage_on(3):
        k32 = jnp.asarray(rng.integers(0, 1 << 30, (32768, 128), dtype=np.int32))

        @jax.jit
        def rowsort_i32(k):
            s = jax.lax.sort((k,), num_keys=1, dimension=1)[0]
            return s ^ jnp.roll(s, 1, axis=1)

        t, _ = chain_time(rowsort_i32, k32, iters=8)
        print(f"row-sort i32 [32768,128]: {t:8.3f} ms/iter", flush=True)

        k64 = jnp.asarray(rng.integers(0, 1 << 56, (32768, 128), dtype=np.int64))

        @jax.jit
        def rowsort_i64(k):
            s = jax.lax.sort((k,), num_keys=1, dimension=1)[0]
            return s ^ jnp.roll(s, 1, axis=1)

        t, _ = chain_time(rowsort_i64, k64, iters=8)
        print(f"row-sort i64 [32768,128]: {t:8.3f} ms/iter", flush=True)

        # current expand-walk sort: 3 operands, 2 keys, f32+i32+i32
        tms = jnp.asarray(rng.random((32768, 128), dtype=np.float32))
        tie = jnp.asarray(rng.integers(0, 3, (32768, 128), dtype=np.int32))
        axs = jnp.asarray(rng.integers(0, 3, (32768, 128), dtype=np.int32))

        @jax.jit
        def rowsort_3op(t_, a, b):
            s, x, y = jax.lax.sort((t_, a, b), num_keys=2, dimension=1)
            return s + jnp.roll(x + y, 1, axis=1).astype(jnp.float32) * 1e-9, x, y ^ x

        t, _ = chain_time(rowsort_3op, (tms, tie, axs), iters=8)
        print(f"row-sort 3-op 2-key [32768,128] (current walk): {t:8.3f} ms/iter", flush=True)

    # ---- 4: blocked scans vs associative_scan -------------------------------
    if stage_on(4):
        v0 = jnp.asarray(rng.random(N2M, dtype=np.float32))
        first0 = jnp.asarray(rng.random(N2M) < 0.3)

        @jax.jit
        def assoc3(v, first):
            def op(a, b):
                fa, ha, ca = a
                fb, hb, cb = b
                return fa | fb, jnp.where(fb, hb, ha + hb), jnp.where(fb, cb, ca + cb)
            f, h, c = jax.lax.associative_scan(op, (first, v, v * 2))
            return h + c, f ^ first

        t, _ = chain_time(assoc3, (v0, first0), iters=8)
        print(f"associative_scan 3-op [2M] (current): {t:8.3f} ms/iter", flush=True)

        @jax.jit
        def blocked(v):
            c = blocked_cumsum(v)
            m = blocked_cummax((c * 1e3).astype(jnp.int32))
            return c + m.astype(jnp.float32) * 1e-9

        t, _ = chain_time(blocked, v0, iters=8)
        print(f"blocked cumsum+cummax [2M]: {t:8.3f} ms/iter", flush=True)
        # verify blocked cumsum
        got = np.asarray(jax.jit(blocked_cumsum)(v0))
        want = np.cumsum(np.asarray(v0), dtype=np.float64)
        assert np.allclose(got, want, rtol=1e-4), "blocked cumsum wrong"
        print("  blocked cumsum verified", flush=True)

        v1 = jnp.asarray(rng.random(NM, dtype=np.float32))
        t, _ = chain_time(blocked, v1, iters=8)
        print(f"blocked cumsum+cummax [10.5M]: {t:8.3f} ms/iter", flush=True)

    # ---- 5: dense sweep (occupancy apply math) over DN ----------------------
    if stage_on(5):
        occ0 = jnp.asarray(np.where(rng.random(DN) < 0.5, np.float32(3e38),
                                    rng.random(DN, dtype=np.float32) - 0.5))
        pend0 = jnp.asarray(rng.integers(0, 1 << 20, DN, dtype=np.uint32))

        @jax.jit
        def sweep(occ, pend):
            n_hit = (pend >> 16).astype(jnp.float32)
            n_miss = (pend & jnp.uint32(0xFFFF)).astype(jnp.float32)
            unobs = occ >= jnp.float32(1e38)
            base = jnp.where(unobs, 0.0, occ)
            total = n_hit * 0.85 + n_miss * -0.4
            value = base + total
            value = jnp.where(total > 0, jnp.minimum(value, 100.0), value)
            value = jnp.where(total < 0, jnp.maximum(value, -100.0), value)
            keep = pend == 0
            out = jnp.where(keep, occ, value)
            return out, pend ^ jnp.roll(pend, 1)

        t, _ = chain_time(sweep, (occ0, pend0), iters=8)
        print(f"dense sweep [8.4M]: {t:8.3f} ms/iter", flush=True)

    # ---- 6: contiguous row gather/scatter ------------------------------------
    if stage_on(6):
        arena = jnp.zeros((2048, V), jnp.float32)
        slots = jnp.asarray(np.sort(rng.choice(2048, R_T, replace=False)).astype(np.int32))

        @jax.jit
        def rows_rt(a):
            rows = a[slots] + 1.0
            return a.at[slots].set(rows, unique_indices=True)

        t, _ = chain_time(rows_rt, arena, iters=8)
        print(f"row gather+scatter [{R_T}x{V}] of [2048,{V}]: {t:8.3f} ms/iter", flush=True)

        @jax.jit
        def rows_dynslice(a):
            # contiguous big slice as bandwidth reference
            rows = jax.lax.dynamic_slice(a, (0, 0), (R_T, V)) + 1.0
            return jax.lax.dynamic_update_slice(a, rows, (0, 0))

        t, _ = chain_time(rows_dynslice, arena, iters=8)
        print(f"contiguous slice+update [{R_T}x{V}]: {t:8.3f} ms/iter", flush=True)

    # ---- 7: scatter confirmation ---------------------------------------------
    if stage_on(7):
        big = jnp.zeros(2048 * V, jnp.uint32)
        idx = jnp.asarray(np.sort(rng.choice(2048 * V, N2M, replace=False)).astype(np.int32))
        val = jnp.asarray(rng.integers(0, 255, N2M, dtype=np.uint32))

        @jax.jit
        def scat(a):
            return a.at[idx].add(val, unique_indices=True)

        t, _ = chain_time(scat, big, iters=4)
        print(f"scatter.add unique [2M] into 67M: {t:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
