"""Probe 6: slope-based timing (trustworthy) + fixed rank-diff deposit.

Probe 5 exposed that chained per-iteration timing is unreliable on the axon
stack: block_until_ready can ack before dependent executions drain (a 67M
elementwise add "measured" 0.02 ms).  This probe times every candidate with
the SLOPE method: run n1 and n2 chained iterations, each ending with a 1-byte
host fetch (which provably forces execution), and report
(T(n2) - T(n1)) / (n2 - n1).  The fetch/RTT constant cancels.

Also fixes the probe-5 deposit bug: dynamic_slice clamps start+size to the
array bound, shifting the record window for the last groups; slicing from a
MAX-padded copy keeps windows exact.

Run: python -u scripts/probe_apply6.py [--stage N] [--platform cpu]
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

# The deposit packs (dest << 22 | position) into one sort key: needs real
# 64-bit integers on device.  Without this flag jnp silently truncates to
# int32 (the probe-5 "i64" sorts were actually i32).
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def slope_time(step, init, n1=4, n2=16):
    """Per-iteration ms via two chained runs each ended by a host fetch.

    ``init`` may be a factory (callable) producing a fresh input - required
    when ``step`` donates its argument.
    """

    def run(n):
        x = init() if callable(init) else init
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x) if not isinstance(x, tuple) else step(*x)
        leaf = x[0] if isinstance(x, tuple) else x
        np.asarray(jax.device_get(leaf.ravel()[:1]))  # force full execution
        return time.perf_counter() - t0

    run(2)  # warmup/compile
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


V = 32768
R_T = 256
DN = R_T * V
NREC = 1 << 21
R_G = 8
DN_G = R_G * V
G = R_T // R_G
K_MAX = 1 << 20


def make_records(rng):
    hot = rng.integers(0, 2048, NREC // 8)
    cold = rng.integers(0, DN, NREC - NREC // 8)
    flats = np.concatenate([hot, cold]).astype(np.int64)
    is_hit = rng.random(NREC) < 0.1
    rec_key = np.sort((flats << 1) | is_hit).astype(np.int64)
    return flats, is_hit, rec_key


def deposit(rec_sorted):
    """u32[DN] packed (hit<<16|miss) counts from sorted record keys.

    rec_sorted: i64[NREC], key = flat<<1 | is_hit (invalid -> int64 max).
    Scan over G region groups; each group: merged single-key sort of
    [record-slice ++ fillerA ++ fillerB], filler-position extraction by a
    second single-key sort, neighbour diffs.  No scans/scatters/gathers.
    """
    flat = (rec_sorted >> 1)
    gb = (jnp.arange(1, G + 1, dtype=jnp.int64) * DN_G)
    counts = jnp.sum(flat[None, :] < gb[:, None], axis=1).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), counts[:-1]])
    ends = counts

    # Pad so dynamic_slice never clamps (start <= NREC, size K_MAX).
    big = jnp.int64(1) << 62
    rec_padded = jnp.concatenate([rec_sorted, jnp.full(K_MAX, big, jnp.int64)])
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (DN_G, 1), 0).squeeze(-1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K_MAX, 1), 0).squeeze(-1)

    def body(carry, g):
        start = starts[g]
        n_in_g = ends[g] - start
        sl = jax.lax.dynamic_slice(rec_padded, (start,), (K_MAX,))
        in_range = iota_k < n_in_g
        base = (g.astype(jnp.int64)) * DN_G
        lflat = (sl >> 1) - base
        hit = (sl & 1)
        k_rec = (lflat << 2) | (hit << 1)
        k_rec = jnp.where(in_range, k_rec, big)
        k_fa = (iota_g.astype(jnp.int64) << 2) | 1
        k_fb = (iota_g.astype(jnp.int64) << 2) | 3
        merged = jnp.concatenate([k_rec, k_fa, k_fb])
        s1 = jax.lax.sort((merged,), num_keys=1)[0]
        p = jax.lax.broadcasted_iota(jnp.int32, (s1.shape[0], 1), 0).squeeze(-1)
        tag = (s1 & 3).astype(jnp.int32)
        v = (s1 >> 2).astype(jnp.int32)
        is_fill = (tag & 1) == 1
        dest = 2 * v + (tag >> 1)
        k2 = jnp.where(is_fill,
                       (dest.astype(jnp.int64) << 22) | p.astype(jnp.int64),
                       big)
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


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def on(n):
        return args.stage in (0, n)

    # ---- 0: correctness of the fixed deposit (any platform) ----------------
    if on(9) or args.stage == 0:
        flats, is_hit, rec_key = make_records(rng)
        pending = np.asarray(jax.jit(deposit)(jnp.asarray(rec_key)))
        want_h = np.zeros(DN, np.int64)
        np.add.at(want_h, flats[is_hit], 1)
        want_m = np.zeros(DN, np.int64)
        np.add.at(want_m, flats[~is_hit], 1)
        assert np.array_equal((pending >> 16).astype(np.int64), np.minimum(want_h, 65535)), "hit wrong"
        assert np.array_equal((pending & 0xFFFF).astype(np.int64), np.minimum(want_m, 65535)), "miss wrong"
        print("rank-diff deposit VERIFIED (fixed)", flush=True)
        if args.platform == "cpu":
            return

    # ---- 1: re-time foundations with slope method ---------------------------
    if on(1):
        k2m = jnp.asarray(rng.integers(0, 1 << 25, NREC, dtype=np.int32))

        @jax.jit
        def srt(k):
            s = jax.lax.sort((k,), num_keys=1)[0]
            return s ^ jnp.roll(s, 1)

        print(f"sort i32 [2M] slope: {slope_time(srt, k2m):8.3f} ms", flush=True)

        k64 = jnp.asarray(rng.integers(0, 1 << 40, 2 * DN_G + K_MAX, dtype=np.int64))

        @jax.jit
        def srt64(k):
            s = jax.lax.sort((k,), num_keys=1)[0]
            return s ^ jnp.roll(s, 1)

        print(f"sort i64 [{(2*DN_G+K_MAX)/1e6:.2f}M] slope: {slope_time(srt64, k64):8.3f} ms", flush=True)

        tiny = jnp.zeros(1024, jnp.float32)
        addt = jax.jit(lambda a: a + 1.0)
        print(f"add [1k] slope (dispatch floor): {slope_time(addt, tiny):8.3f} ms", flush=True)

        adddon = jax.jit(lambda a: a + 1.0, donate_argnums=0)
        print(f"add [67M] donated slope: {slope_time(adddon, lambda: jnp.zeros(2048 * V, jnp.float32)):8.3f} ms", flush=True)

        adds = jax.jit(lambda a: a + 1.0, donate_argnums=0)
        print(f"add [8.4M] donated slope: {slope_time(adds, lambda: jnp.zeros(DN, jnp.float32)):8.3f} ms", flush=True)

    # ---- 2: deposit timing ---------------------------------------------------
    if on(2):
        _, _, rec_key = make_records(rng)
        rk = jnp.asarray(rec_key)

        @jax.jit
        def dep_chain(r):
            p = deposit(r)
            return r ^ p[:1].astype(jnp.int64)

        print(f"deposit [2M->8.4M, G={G}] slope: {slope_time(dep_chain, rk, n1=2, n2=8):8.3f} ms", flush=True)

    # ---- 3: dense sweep + rows slope ------------------------------------------
    if on(3):
        pend = jnp.asarray(rng.integers(0, 1 << 20, DN, dtype=np.uint32))
        slots = jnp.asarray(np.sort(rng.choice(2048, R_T, replace=False)).astype(np.int32))
        pend2 = pend.reshape(R_T, V)

        def sweep(o, p):
            n_hit = (p >> 16).astype(jnp.float32)
            n_miss = (p & jnp.uint32(0xFFFF)).astype(jnp.float32)
            unobs = o >= jnp.float32(1e38)
            base = jnp.where(unobs, 0.0, o)
            total = n_hit * 0.85 + n_miss * -0.4
            value = jnp.clip(base + total, -100.0, 100.0)
            return jnp.where(p == 0, o, value)

        def rows_sweep(a):
            old = a[slots]
            new = sweep(old.reshape(-1), pend2.reshape(-1)).reshape(R_T, V)
            return a.at[slots].set(new, unique_indices=True)

        rs = jax.jit(rows_sweep, donate_argnums=0)
        print(f"row gather+sweep+scatter donated slope: {slope_time(rs, lambda: jnp.full((2048, V), 3e38, jnp.float32)):8.3f} ms", flush=True)

        # variant: full-arena sweep with compact row mapping instead of rows
        sw = jax.jit(lambda o: sweep(o, pend), donate_argnums=0)
        print(f"dense sweep [8.4M] donated slope: {slope_time(sw, lambda: jnp.full(DN, 3e38, jnp.float32)):8.3f} ms", flush=True)

    # ---- 4: current pipeline phases, slope-timed -------------------------------
    if on(4):
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

        def exp_step(b):
            rec, stats = expand_records_jit(b, cfg)
            b2 = dict(b)
            b2["touch"] = b["touch"] ^ rec["key"][:b["touch"].shape[0]].astype(jnp.uint32)
            return b2

        print(f"expand phase slope: {slope_time(exp_step, batch, n1=2, n2=8):8.3f} ms", flush=True)

        records, _ = expand_records_jit(batch, cfg)
        records = jax.block_until_ready(records)

        def app_step(st):
            st2, _, _ = apply_records_jit(st, records, batch, cfg)
            return st2

        print(f"apply phase slope: {slope_time(app_step, state, n1=2, n2=8):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
