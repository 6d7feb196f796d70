"""Unit tests for ops.blocked (the TPU-fast segmented-reduce core)."""

import numpy as np
import jax.numpy as jnp

from ohm_tpu.ops import blocked


def _ref_segment_sums(vals, first):
    out = np.zeros_like(vals, dtype=np.float64)
    run = 0.0
    for i in range(len(vals)):
        if first[i]:
            run = 0.0
        run += float(vals[i])
        out[i] = run
    return out


def test_cummax_and_cumsum_match_numpy():
    rng = np.random.default_rng(0)
    for n in (1, 7, 1024, 1025, 70000):
        x = rng.integers(-1000, 1000, n).astype(np.int32)
        np.testing.assert_array_equal(np.asarray(blocked.cummax(jnp.asarray(x))),
                                      np.maximum.accumulate(x))
        f = rng.random(n).astype(np.float32)
        np.testing.assert_allclose(np.asarray(blocked.cumsum(jnp.asarray(f))),
                                   np.cumsum(f), rtol=1e-5)


def test_segment_sums_matches_sequential():
    rng = np.random.default_rng(1)
    for n, p in ((7, 0.5), (1024, 0.02), (5000, 0.01), (200000, 0.003)):
        vals = (rng.random(n) * 0.2).astype(np.float32)
        first = rng.random(n) < p
        first[0] = True
        out = np.asarray(blocked.segment_sums(jnp.asarray(vals), jnp.asarray(first)))
        ref = _ref_segment_sums(vals, first)
        # Error must scale with SEGMENT magnitude (~segment_len * 0.2), not
        # the global prefix (~n * 0.1): the old cumsum-minus-base form lost
        # ~0.01-0.03 absolute at 2M records.
        assert np.abs(out - ref).max() < 1e-3


def test_segment_sums_error_stays_segment_local_at_scale():
    # 2M records, short segments, values ~0.1: the global prefix reaches
    # ~1e5 — a global-cumsum cancellation would show ~1e-2 errors here.
    rng = np.random.default_rng(2)
    n = 1 << 21
    vals = (rng.random(n) * 0.2).astype(np.float32)
    first = rng.random(n) < (1.0 / 150.0)
    first[0] = True
    out = np.asarray(blocked.segment_sums(jnp.asarray(vals), jnp.asarray(first)))
    seg_id = np.cumsum(first) - 1
    ref_totals = np.bincount(seg_id, weights=vals.astype(np.float64))
    last = np.concatenate([seg_id[1:] != seg_id[:-1], [True]])
    got_totals = out[last]
    assert np.abs(got_totals - ref_totals).max() < 2e-4
