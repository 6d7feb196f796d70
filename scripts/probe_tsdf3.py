"""Per-visit TSDF seed/deposit primitive alternatives.

The per-visit path (ops/integrate_tsdf.py, cap branch) spends its extra
time (vs batch-blend) in: the fpos compaction sort, two cap-sized gathers
(fids from the 1.19M stream, (w0,d0) pairs from the 16.7M plane), three
cap->stream scatters, and compact_deposit's third big sort.  This probe
prices each alternative on realistic shapes so the rewrite targets the
real costs:

  g1d     cap-sized 1-D gather from the n_rec stream     (fids today)
  g2d     cap-sized [cap,2] gather from the 16.7M plane  (seed today)
  g1dp    cap-sized 1-D gather from the plane, x2        (unstacked seed)
  sortf1  1-op fpos sort                                  (today)
  sortf2  2-op fpos sort (ids ride as payload)            (kills g1d)
  scat    cap->n_rec scatter (today x3)
  depo3   3-op n_rec compact sort + 2 windowed scatters   (today)
  depog   stacked [n_rec,2] build + cap gather + 2 scatters (sort-free)

Run solo:  python -u scripts/probe_tsdf3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def time_op(label, fn, args, reps=3, inner=10):
    jitted = jax.jit(fn)
    out = jitted(*args)
    fence(out[0] if isinstance(out, (tuple, list)) else out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = jitted(*args)
        fence(out[0] if isinstance(out, (tuple, list)) else out)
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:7.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(7)
    n_rec = 1187840
    cap = 262144
    plane_n = 512 * 32768
    print(f"devices: {jax.devices()}  n_rec={n_rec} cap={cap} plane={plane_n}",
          flush=True)

    ids_s = jnp.asarray(np.sort(rng.integers(0, plane_n, n_rec)), jnp.int32)
    stream_f = jnp.asarray(rng.random(n_rec), jnp.float32)
    stream_f2 = jnp.asarray(rng.random(n_rec), jnp.float32)
    cap_idx = jnp.asarray(np.sort(rng.integers(0, n_rec, cap)), jnp.int32)
    plane_idx = jnp.asarray(np.sort(rng.integers(0, plane_n, cap)), jnp.int32)
    plane_w = jnp.asarray(rng.random(plane_n), jnp.float32)
    plane_d = jnp.asarray(rng.random(plane_n), jnp.float32)
    fpos = jnp.where(jnp.asarray(rng.random(n_rec) < 0.4),
                     jax.lax.broadcasted_iota(jnp.int32, (n_rec, 1), 0).squeeze(-1),
                     jnp.int32(2**31 - 2))
    cap_vals = jnp.asarray(rng.random(cap), jnp.float32)
    fence(plane_d)

    time_op("g1d    stream[capidx]      ",
            lambda s, i: s[i], (stream_f, cap_idx))
    time_op("g2d    stack+plane[capidx] ",
            lambda a, b, i: jnp.stack([a, b], axis=-1)[i],
            (plane_w, plane_d, plane_idx))
    time_op("g1dp   plane[capidx] x2    ",
            lambda a, b, i: (a[i], b[i]), (plane_w, plane_d, plane_idx))
    time_op("sortf1 1-op fpos sort      ",
            lambda f: jax.lax.sort((f,), num_keys=1), (fpos,))
    time_op("sortf2 2-op fpos sort      ",
            lambda f, i: jax.lax.sort((f, i), num_keys=1), (fpos, ids_s))
    time_op("sortf3 3-op fpos sort      ",
            lambda f, i, j: jax.lax.sort((f, i, j), num_keys=1),
            (fpos, ids_s, ids_s))
    time_op("scat   cap->n_rec set      ",
            lambda v, t: jnp.zeros(n_rec + 1, jnp.float32).at[t].set(
                v, indices_are_sorted=True, unique_indices=True, mode="drop"),
            (cap_vals, cap_idx))
    time_op("scat2  cap->n_rec set x2   ",
            lambda v, t: (jnp.zeros(n_rec + 1, jnp.float32).at[t].set(
                v, indices_are_sorted=True, unique_indices=True, mode="drop"),
                jnp.zeros(n_rec + 1, jnp.float32).at[t].set(
                v * 2, indices_are_sorted=True, unique_indices=True,
                mode="drop")),
            (cap_vals, cap_idx))

    big = jnp.int32(2**31 - 2)
    last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])

    def depo3(ids_s, last, a, b, pw, pd):
        key = jnp.where(last, ids_s, big)
        k, sa, sb = jax.lax.sort((key, a, b), num_keys=1)
        kc = k[:cap]
        real = kc != big
        cpos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        tgt = jnp.where(real, kc, plane_n - 8 + (cpos % 8))
        o1 = pw.at[tgt].set(jnp.where(real, sa[:cap], 0.0),
                            indices_are_sorted=True, unique_indices=False,
                            mode="promise_in_bounds")
        o2 = pd.at[tgt].set(jnp.where(real, sb[:cap], 0.0),
                            indices_are_sorted=True, unique_indices=False,
                            mode="promise_in_bounds")
        return o1, o2

    time_op("depo3  sort3 + 2 scatters  ", depo3,
            (ids_s, last, stream_f, stream_f2, plane_w, plane_d))

    # Sort-free deposit: gather (a,b) at known last positions lpos (cap-sized,
    # from the seed machinery), then scatter at fids targets.
    lpos = cap_idx
    fids_c = jnp.asarray(np.sort(rng.integers(0, plane_n, cap)), jnp.int32)

    def depog(a, b, lpos, fids_c, pw, pd):
        pair = jnp.stack([a, b], axis=-1)[lpos]
        o1 = pw.at[fids_c].set(pair[:, 0], indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        o2 = pd.at[fids_c].set(pair[:, 1], indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        return o1, o2

    time_op("depog  pairgather + 2 scat ", depog,
            (stream_f, stream_f2, lpos, fids_c, plane_w, plane_d))

    def depog2(a, b, lpos, fids_c, pw, pd):
        o1 = pw.at[fids_c].set(a[lpos], indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        o2 = pd.at[fids_c].set(b[lpos], indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        return o1, o2

    time_op("depog2 2x(gather + scat)   ", depog2,
            (stream_f, stream_f2, lpos, fids_c, plane_w, plane_d))

    # Full-stream seed gathers (today's UNCAPPED per-visit branch: scatter_cap
    # >= n_rec disables the window in the bench config, so this is the live
    # cost).  gfull2: two separate plane gathers (today).  gfullp: one
    # stacked-pair gather.  gmin/gmax: segment min/max via blocked cummax
    # (the hybrid's straddle classifier).
    time_op("gfull2 plane[ids] x2       ",
            lambda a, b, i: (a[i], b[i]), (plane_w, plane_d, ids_s))
    time_op("gfullp stack+plane[ids]    ",
            lambda a, b, i: jnp.stack([a, b], axis=-1)[i],
            (plane_w, plane_d, ids_s))

    from ohm_tpu.ops import blocked

    first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    fence(first)

    def minmax(v, first):
        hi = blocked.cummax(jnp.where(first, v, jnp.float32(-3e38)))
        # segment max: cummax of v with resets — emulate via cummax over
        # (segment_rank-scaled) trick is complex; approximate cost with two
        # plain cummaxes + a segment_sums (upper bound of the real op).
        a = blocked.cummax(v)
        b = blocked.segment_sums(v, first)
        return hi + a + b

    time_op("gstat  2 cummax + segsum   ", minmax, (stream_f, first))


if __name__ == "__main__":
    main()
