"""Deposit + seed variants on an interleaved [plane, 2] TSDF state.

The per-visit path pays two full-stream scatters for the (w, d) deposit and
one stacked pair gather for the seed.  If the TSDF state lived interleaved
as one [plane, 2] array, the deposit becomes one row scatter and the seed
gather loses its stack.  Prices:

  scatA  2x 1-D full-stream scatter into separate planes   (today)
  scatB  1x [n_rec,2] row scatter into [plane,2]           (interleaved)
  scatC  scatB + unstack back to two planes                (compat cost)
  gatA   stack + [n_rec,2] pair gather                     (today, 17.9)
  gatB   [n_rec,2] pair gather from resident [plane,2]     (interleaved)

Run solo:  python -u scripts/probe_tsdf4.py
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
    plane_n = 512 * 32768
    print(f"devices: {jax.devices()}  n_rec={n_rec} plane={plane_n}",
          flush=True)

    ids_s = jnp.asarray(np.sort(rng.integers(0, plane_n, n_rec)), jnp.int32)
    last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
    a = jnp.asarray(rng.random(n_rec), jnp.float32)
    b = jnp.asarray(rng.random(n_rec), jnp.float32)
    plane_w = jnp.asarray(rng.random(plane_n), jnp.float32)
    plane_d = jnp.asarray(rng.random(plane_n), jnp.float32)
    plane_wd = jnp.stack([np.asarray(plane_w), np.asarray(plane_d)], axis=-1)
    plane_wd = jnp.asarray(plane_wd)
    fence(plane_wd)

    # Unique scatter targets: lasts scatter to their id, non-lasts to a pad
    # row offset by stream position (mirrors _unique_scatter_indices).
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_rec, 1), 0).squeeze(-1)
    # fake pad region: reuse id but shifted into a dummy tail we ignore
    tgt = jnp.where(last, ids_s, plane_n - 1)
    fence(tgt)

    def scatA(a, b, pw, pd):
        va = jnp.where(last, a, 0.0)
        vb = jnp.where(last, b, 0.0)
        o1 = pw.at[tgt].set(va, indices_are_sorted=True, unique_indices=False,
                            mode="promise_in_bounds")
        o2 = pd.at[tgt].set(vb, indices_are_sorted=True, unique_indices=False,
                            mode="promise_in_bounds")
        return o1, o2

    time_op("scatA  2x 1-D scatter      ", scatA, (a, b, plane_w, plane_d))

    def scatB(a, b, pwd):
        v = jnp.stack([jnp.where(last, a, 0.0), jnp.where(last, b, 0.0)],
                      axis=-1)
        return pwd.at[tgt].set(v, indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")

    time_op("scatB  1x row scatter      ", scatB, (a, b, plane_wd))

    def scatC(a, b, pwd):
        o = scatB(a, b, pwd)
        return o[:, 0], o[:, 1]

    time_op("scatC  row scatter+unstack ", scatC, (a, b, plane_wd))

    time_op("gatA   stack + pair gather ",
            lambda pw, pd, i: jnp.stack([pw, pd], axis=-1)[i],
            (plane_w, plane_d, ids_s))
    time_op("gatB   resident pair gather",
            lambda pwd, i: pwd[i], (plane_wd, ids_s))

    # 1-D gather for comparison (is the pair row the same latency as 1 elem?)
    time_op("gat1   1-D full gather     ",
            lambda pw, i: pw[i], (plane_w, ids_s))


if __name__ == "__main__":
    main()
