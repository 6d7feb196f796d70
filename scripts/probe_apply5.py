"""Probe 5: validate the rank-diff deposit design + donation-corrected costs.

Probe 4 findings this builds on:
  - 1D single-key sorts are ~free at 2M, 23.6 ms at 10M: find the threshold.
  - associative_scan 3-op at 2M = 11 ms: the current segmented reduce is half
    the apply budget.  The redesign must be SCAN-FREE.
  - scatter.add(unique) 2M = 27.8 ms: the redesign must be SCATTER-FREE.
  - dense sweep / row gather+scatter numbers were measured WITHOUT donation,
    so they include a full arena copy; re-measure donated.

The rank-diff deposit (scan/scatter/gather-free dense count materialisation):
  sort [records ++ fillerA(v) ++ fillerB(v)] by key (v<<2 | tag) with
  tag order miss(0) < A(1) < hit(2) < B(3).  Let p_A(v), p_B(v) be the sorted
  positions of the fillers.  Then
      n_miss(v) = p_A(v) - p_B(v-1) - 1
      n_hit(v)  = p_B(v) - p_A(v) - 1
  Positions are extracted to dense order by a second single-key sort with
  key ((2v+isB) << 22 | p); both sorts stay under the fast-path size by
  processing independent REGION GROUPS (records pre-grouped for free by the
  initial record sort, sliced at offsets from a compare-count "searchsorted").

Run: python -u scripts/probe_apply5.py [--stage N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def on(n):
        return args.stage in (0, n)

    V = 32768
    R_T = 256               # touched regions (compact space)
    DN = R_T * V            # 8.4M
    NREC = 1 << 21          # 2M records

    # ---- 1: sort size threshold ---------------------------------------------
    if on(1):
        for n, dt in ((3 << 20, np.int32), (4 << 20, np.int32), (6 << 20, np.int32),
                      (8 << 20, np.int32), ((1 << 21) + (1 << 17), np.int64),
                      (27 << 17, np.int64)):  # 2.125M i64, 3.4M i64
            k0 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=dt))

            @jax.jit
            def srt(k):
                s = jax.lax.sort((k,), num_keys=1)[0]
                return s ^ jnp.roll(s, 1)

            t, _ = chain_time(srt, k0, iters=8)
            print(f"sort {np.dtype(dt).name} 1-key [{n/1e6:.2f}M]: {t:8.3f} ms/iter", flush=True)

    # ---- 2: donated dense ops ------------------------------------------------
    if on(2):
        big = jnp.zeros(2048 * V, jnp.float32)  # 268 MB

        @jax.jit
        def addbig(a):
            return a + 1.0

        # donated variant
        adddon = jax.jit(lambda a: a + 1.0, donate_argnums=0)
        t, big = chain_time(addbig, big, iters=8)
        print(f"elementwise add [67M] no-donate: {t:8.3f} ms/iter", flush=True)
        big = jnp.zeros(2048 * V, jnp.float32)
        t, big = chain_time(adddon, big, iters=8)
        print(f"elementwise add [67M] donated:   {t:8.3f} ms/iter", flush=True)

        # donated dense sweep over 8.4M with separate pending input
        occ = jnp.full(DN, 3e38, jnp.float32)
        pend = jnp.asarray(rng.integers(0, 1 << 20, DN, dtype=np.uint32))

        def sweep(o, p):
            n_hit = (p >> 16).astype(jnp.float32)
            n_miss = (p & jnp.uint32(0xFFFF)).astype(jnp.float32)
            unobs = o >= jnp.float32(1e38)
            base = jnp.where(unobs, 0.0, o)
            total = n_hit * 0.85 + n_miss * -0.4
            value = jnp.clip(base + total, -100.0, 100.0)
            return jnp.where(p == 0, o, value)

        sweep_don = jax.jit(sweep, donate_argnums=0)

        def wrap(o):
            return sweep_don(o, pend)

        t, _ = chain_time(wrap, occ, iters=8)
        print(f"dense sweep [8.4M] donated:      {t:8.3f} ms/iter", flush=True)

        # donated row gather + sweep + row scatter on 2D arena
        arena = jnp.full((2048, V), 3e38, jnp.float32)
        slots = jnp.asarray(np.sort(rng.choice(2048, R_T, replace=False)).astype(np.int32))
        pend2 = pend.reshape(R_T, V)

        def rows_sweep(a):
            old = a[slots]
            new = sweep(old.reshape(-1), pend2.reshape(-1)).reshape(R_T, V)
            return a.at[slots].set(new, unique_indices=True)

        rs = jax.jit(rows_sweep, donate_argnums=0)
        t, _ = chain_time(rs, arena, iters=8)
        print(f"row gather+sweep+scatter [{R_T}x{V}] donated: {t:8.3f} ms/iter", flush=True)

    # ---- 3: compare-count searchsorted ----------------------------------------
    if on(3):
        recs = jnp.asarray(np.sort(rng.integers(0, DN, NREC, dtype=np.int32)))
        G = 16
        bounds = jnp.asarray((np.arange(1, G) * (DN // G)).astype(np.int32))

        @jax.jit
        def offsets(r):
            # count of records < bound, per bound: [G-1] via compare+reduce
            c = jnp.sum(r[None, :] < bounds[:, None], axis=1).astype(jnp.int32)
            return c, r ^ jnp.roll(r, 1)

        t, _ = chain_time(lambda r: offsets(r)[1], recs, iters=8)
        print(f"compare-count offsets [{G-1}x2M]: {t:8.3f} ms/iter", flush=True)

    # ---- 4: rank-diff deposit, grouped, end-to-end -----------------------------
    if on(4):
        # Realistic skewed records: 1/8 hot (few voxels), rest uniform.
        hot = rng.integers(0, 2048, NREC // 8)
        cold = rng.integers(0, DN, NREC - NREC // 8)
        flats = np.concatenate([hot, cold]).astype(np.int64)
        is_hit = rng.random(NREC) < 0.1
        rec_key = np.sort((flats << 1) | is_hit).astype(np.int64)
        rec_key_j = jnp.asarray(rec_key)

        R_G = 8                  # regions per group
        DN_G = R_G * V           # 262144 voxels per group
        G = R_T // R_G           # 32 groups
        K_MAX = 1 << 20          # record slice per group

        def deposit(rec_sorted):
            """rec_sorted: i64[(NREC)] keys (flat<<1|hit), sorted.  Returns
            u32[DN] packed (hit<<16|miss) counts, scan over G groups."""
            flat = (rec_sorted >> 1).astype(jnp.int32)
            # group offsets by compare-count
            gb = (jnp.arange(1, G + 1, dtype=jnp.int32) * DN_G)
            counts = jnp.sum(flat[None, :] < gb[:, None], axis=1)
            starts = jnp.concatenate([jnp.zeros(1, jnp.int32), counts[:-1]])
            ends = counts

            iota_g = jax.lax.broadcasted_iota(jnp.int32, (DN_G, 1), 0).squeeze(-1)

            def body(carry, g):
                start = starts[g]
                n_in_g = ends[g] - start
                sl = jax.lax.dynamic_slice(rec_sorted, (start,), (K_MAX,))
                in_range = jax.lax.broadcasted_iota(jnp.int32, (K_MAX, 1), 0).squeeze(-1) < n_in_g
                base = (g * DN_G).astype(jnp.int64)
                lflat = (sl >> 1) - base          # local flat in group
                hit = (sl & 1).astype(jnp.int32)
                # record key: (lflat<<2) | (hit?2:0); trash -> huge
                k_rec = (lflat << 2) | (hit << 1).astype(jnp.int64)
                k_rec = jnp.where(in_range, k_rec, jnp.int64(1) << 62)
                k_fa = ((iota_g.astype(jnp.int64)) << 2) | 1
                k_fb = ((iota_g.astype(jnp.int64)) << 2) | 3
                merged = jnp.concatenate([k_rec, k_fa, k_fb])
                s1 = jax.lax.sort((merged,), num_keys=1)[0]
                # second sort: fillers keyed by (2v+isB)<<22 | p ; records MAX
                p = jax.lax.broadcasted_iota(jnp.int32, (s1.shape[0], 1), 0).squeeze(-1)
                tag = (s1 & 3).astype(jnp.int32)
                v = (s1 >> 2).astype(jnp.int32)
                is_fill = (tag & 1) == 1
                dest = 2 * v + (tag >> 1)  # A->2v, B->2v+1
                k2 = jnp.where(is_fill,
                               (dest.astype(jnp.int64) << 22) | p.astype(jnp.int64),
                               jnp.int64(1) << 62)
                s2 = jax.lax.sort((k2,), num_keys=1)[0]
                pos = (s2 & ((1 << 22) - 1)).astype(jnp.int32)[:2 * DN_G].reshape(DN_G, 2)
                pa = pos[:, 0]
                pb = pos[:, 1]
                pb_prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pb[:-1]])
                n_miss = pa - pb_prev - 1
                n_hit = pb - pa - 1
                packed = (jnp.minimum(n_hit, 65535).astype(jnp.uint32) << 16) | \
                    jnp.minimum(n_miss, 65535).astype(jnp.uint32)
                return carry, packed

            _, ys = jax.lax.scan(body, 0, jnp.arange(G, dtype=jnp.int32))
            return ys.reshape(-1)

        dep = jax.jit(deposit)
        pending = np.asarray(dep(rec_key_j))
        # verify
        want_h = np.zeros(DN, np.int64)
        np.add.at(want_h, flats[is_hit], 1)
        want_m = np.zeros(DN, np.int64)
        np.add.at(want_m, flats[~is_hit], 1)
        got_h = (pending >> 16).astype(np.int64)
        got_m = (pending & 0xFFFF).astype(np.int64)
        assert np.array_equal(got_h, np.minimum(want_h, 65535)), "hit counts wrong"
        assert np.array_equal(got_m, np.minimum(want_m, 65535)), "miss counts wrong"
        print("rank-diff deposit VERIFIED", flush=True)

        @jax.jit
        def dep_chain(r):
            p = deposit(r)
            return r ^ p[:1].astype(jnp.int64)  # tiny dependency

        t, _ = chain_time(dep_chain, rec_key_j, iters=8)
        print(f"rank-diff deposit [2M rec -> {DN/1e6:.1f}M dense, G={G}]: {t:8.3f} ms/iter", flush=True)

    # ---- 5: flattened 1D walk sort ---------------------------------------------
    if on(5):
        B, S3 = 32768, 105
        n = B * S3  # 3.44M
        k0 = jnp.asarray(rng.integers(0, 1 << 48, n, dtype=np.int64))

        @jax.jit
        def srt(k):
            s = jax.lax.sort((k,), num_keys=1)[0]
            return s ^ jnp.roll(s, 1)

        t, _ = chain_time(srt, k0, iters=8)
        print(f"walk sort flat i64 [{n/1e6:.2f}M]: {t:8.3f} ms/iter", flush=True)

        @jax.jit
        def srt2(k):
            h = n // 2
            a = jax.lax.sort((k[:h],), num_keys=1)[0]
            b = jax.lax.sort((k[h:],), num_keys=1)[0]
            s = jnp.concatenate([a, b])
            return s ^ jnp.roll(s, 1)

        t, _ = chain_time(srt2, k0, iters=8)
        print(f"walk sort 2x half i64 [{n/1e6:.2f}M]: {t:8.3f} ms/iter", flush=True)

        # packed-count cumsum along rows: [B, 105] i32, log-shift
        x0 = jnp.asarray(rng.integers(0, 3, (B, S3), dtype=np.int32))

        @jax.jit
        def rowcum(x):
            inc = jnp.where(x == 0, 1, jnp.where(x == 1, 1 << 10, 1 << 20))
            y = inc
            sh = 1
            while sh < S3:
                y = y + jnp.pad(y, ((0, 0), (sh, 0)))[:, :S3]
                sh *= 2
            return jnp.where(x == 0, y & 1023, x)

        t, _ = chain_time(rowcum, x0, iters=8)
        print(f"packed row cumsum [B,105]: {t:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
