"""Probe 7: sorted-indices scatter/gather - the decisive measurement.

Probe 6 (slope-timed, trustworthy) established:
  - i32 sort 2M = 2.7 ms (1.4 ns/elem), i64 1.57M = 3.6 ms (2.3 ns/elem)
  - elementwise = ~free, dispatch floor = ~0
  - filler sort-join deposit = 211 ms (DEAD: sorts ~99M padded elements)
  - random unique scatter 2M = 27.8 ms (13 ns/elem, DEAD)

Candidate final design: ONE i64 sort packs (voxel<<32 | payload); per-voxel
totals at segment-last positions; compact them to the front with the same
sort; then a SPARSE voxel update: gather old occupancy at sorted unique
indices, elementwise math, scatter .set back at sorted unique indices.
Everything hinges on whether XLA:TPU exploits indices_are_sorted.

Run: python -u scripts/probe_apply7.py [--stage N]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ap = argparse.ArgumentParser()
ap.add_argument("--stage", type=int, default=0)
ap.add_argument("--platform", default=None)
args = ap.parse_args()

if args.platform:
    import jax

    jax.config.update("jax_platforms", args.platform)
else:
    from ohm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def slope_time(step, init, n1=4, n2=16):
    def run(n):
        x = init() if callable(init) else init
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x) if not isinstance(x, tuple) else step(*x)
        leaf = x[0] if isinstance(x, tuple) else x
        np.asarray(jax.device_get(leaf.ravel()[:1]))
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


V = 32768
ARENA = 2048 * V  # 67M


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def on(n):
        return args.stage in (0, n)

    # ---- 1: sorted vs random scatter/gather scaling ---------------------------
    if on(1):
        for n, label in ((1 << 18, "262k"), (1 << 20, "1M"), (1 << 21, "2M")):
            idx_sorted = np.sort(rng.choice(ARENA, n, replace=False)).astype(np.int32)
            vals = rng.random(n).astype(np.float32)
            isj = jnp.asarray(idx_sorted)
            vj = jnp.asarray(vals)

            def scat_sorted(a):
                return a.at[isj].set(vj, unique_indices=True, indices_are_sorted=True)

            f = jax.jit(scat_sorted, donate_argnums=0)
            t = slope_time(f, lambda: jnp.zeros(ARENA, jnp.float32))
            print(f"scatter.set sorted+unique [{label}] -> 67M: {t:8.3f} ms", flush=True)

            def gath_sorted(x):
                g = x[isj]  # hint path below
                return x + g[0]

            # explicit indices_are_sorted via lax.gather is awkward; use take
            def gath2(x):
                g = jnp.take(x, isj, indices_are_sorted=True, unique_indices=True)
                return x + g[0]

            t = slope_time(jax.jit(gath2, donate_argnums=0),
                           lambda: jnp.zeros(ARENA, jnp.float32))
            print(f"gather take sorted+unique [{label}] from 67M: {t:8.3f} ms", flush=True)

    # ---- 2: full sparse roundtrip: gather + math + scatter --------------------
    if on(2):
        n = 1 << 20
        idx_sorted = np.sort(rng.choice(ARENA, n, replace=False)).astype(np.int32)
        cnts = rng.integers(0, 1 << 20, n, dtype=np.uint32)
        isj = jnp.asarray(idx_sorted)
        cj = jnp.asarray(cnts)

        def roundtrip(a):
            old = jnp.take(a, isj, indices_are_sorted=True, unique_indices=True)
            n_hit = (cj >> 16).astype(jnp.float32)
            n_miss = (cj & jnp.uint32(0xFFFF)).astype(jnp.float32)
            unobs = old >= jnp.float32(1e38)
            base = jnp.where(unobs, 0.0, old)
            val = jnp.clip(base + n_hit * 0.85 - n_miss * 0.4, -100.0, 100.0)
            return a.at[isj].set(val, unique_indices=True, indices_are_sorted=True)

        f = jax.jit(roundtrip, donate_argnums=0)
        t = slope_time(f, lambda: jnp.full(ARENA, 3e38, jnp.float32))
        print(f"sparse gather+math+scatter [1M] on 67M: {t:8.3f} ms", flush=True)

    # ---- 3: i64 sort 2M + compaction slice (the combined reduce) --------------
    if on(3):
        n = 1 << 21
        keys = rng.integers(0, 1 << 25, n, dtype=np.int64)
        k64 = jnp.asarray((keys << 32) | rng.integers(0, 1 << 20, n))

        @jax.jit
        def srt(k):
            s = jax.lax.sort((k,), num_keys=1)[0]
            return s ^ jnp.roll(s, 1)

        print(f"sort i64 [2M] slope: {slope_time(srt, k64):8.3f} ms", flush=True)

    # ---- 4: segment-boundary reduce without scans ------------------------------
    if on(4):
        # After sorting (id<<1|hit) i32, counts per id via iota diffs at
        # boundaries need first-position propagation = one blocked cummax.
        n = 1 << 21
        ids = np.sort(rng.integers(0, 1 << 23, n, dtype=np.int32))
        idsj = jnp.asarray(ids)

        def blocked_cummax_i32(x):
            C = 1024
            R = x.shape[0] // C
            y = x.reshape(R, C)
            sh = 1
            NEG = jnp.int32(-(1 << 30))
            while sh < C:
                y = jnp.maximum(y, jnp.pad(y, ((0, 0), (sh, 0)), constant_values=NEG)[:, :C])
                sh *= 2
            row_tot = y[:, -1]
            r = row_tot
            sh = 1
            while sh < R:
                r = jnp.maximum(r, jnp.pad(r, (sh, 0), constant_values=NEG)[:R])
                sh *= 2
            row_prefix = jnp.concatenate([jnp.full((1,), NEG, jnp.int32), r[:-1]])
            return jnp.maximum(y, row_prefix[:, None]).reshape(-1)

        @jax.jit
        def reduce_counts(s):
            pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            startpos = blocked_cummax_i32(jnp.where(first, pos, -(1 << 30)))
            cnt = pos - startpos + 1  # count at last positions
            return s ^ cnt

        print(f"boundary reduce (1 blocked cummax) [2M]: {slope_time(reduce_counts, idsj):8.3f} ms", flush=True)

        @jax.jit
        def assoc2(s):
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])

            def op(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, va + vb)

            _, tot = jax.lax.associative_scan(op, (first, s))
            return s ^ tot

        print(f"associative_scan 2-op [2M]: {slope_time(assoc2, idsj):8.3f} ms", flush=True)

    # ---- 5: row-sort slope (expand walk) ----------------------------------------
    if on(5):
        k = jnp.asarray(rng.integers(0, 1 << 30, (32768, 128), dtype=np.int32))

        @jax.jit
        def rs(x):
            s = jax.lax.sort((x,), num_keys=1, dimension=1)[0]
            return s ^ jnp.roll(s, 1, axis=1)

        print(f"row-sort i32 [32768,128] slope: {slope_time(rs, k):8.3f} ms", flush=True)

        tms = jnp.asarray(rng.random((32768, 128), dtype=np.float32))
        tie = jnp.asarray(rng.integers(0, 3, (32768, 128), dtype=np.int32))

        @jax.jit
        def rs3(t_, a):
            s, x = jax.lax.sort((t_, a), num_keys=2, dimension=1)
            return s + x.astype(jnp.float32) * 1e-9, x ^ 1

        print(f"row-sort 2-op 2-key [32768,128] slope: {slope_time(rs3, (tms, tie)):8.3f} ms", flush=True)

    # ---- 6: current pipeline phases slope ----------------------------------------
    if on(6):
        from ohm_tpu.core.map import OccupancyMap, MapFlag
        from ohm_tpu.mapping.tpu_map import TpuRayMapper
        from ohm_tpu.ops.integrate import expand_records_jit, apply_records_jit
        import bench as benchmod

        m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        mapper = TpuRayMapper(m, capacity=2048)
        rays = benchmod.box_scene_rays(8192, rng)
        from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots, compact_batch

        prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)
        mapper.arena.ensure_regions(prepared.region_keys, host_map=m)
        fill_corner_slots(prepared, mapper.arena.table)
        wire = compact_batch(prepared, 32)
        batch = {k: jnp.asarray(v) for k, v in wire.items()}
        cfg = mapper._config(0)
        state = mapper.arena.device_state()
        print(f"n_segments={prepared.n_segments} size={prepared.size}", flush=True)

        def exp_step(tch):
            b2 = dict(batch)
            b2["touch"] = tch
            rec, stats = expand_records_jit(b2, cfg)
            return tch ^ rec["key"][:tch.shape[0]].astype(jnp.uint32)

        print(f"expand phase slope: {slope_time(exp_step, batch['touch'], n1=2, n2=8):8.3f} ms", flush=True)

        records, _ = expand_records_jit(batch, cfg)
        records = jax.block_until_ready(records)

        def app_step(st):
            st2, _, _ = apply_records_jit(st, records, batch, cfg)
            return st2["occupancy"]

        def init_state():
            return dict(state)

        # apply donates state; rebuild each run
        def app_wrap(occ):
            st = dict(state)
            st["occupancy"] = occ
            st2, _, _ = apply_records_jit(st, records, batch, cfg)
            return st2["occupancy"]

        print(f"apply phase slope: {slope_time(app_wrap, lambda: jnp.asarray(np.asarray(state['occupancy'])), n1=2, n2=8):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
