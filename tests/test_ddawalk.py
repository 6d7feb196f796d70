"""Direct device-walk tests: the rank-based unordered walk must emit the
SAME voxel visit set as the time-sorted walk (ops/ddawalk.py) — the expand
phase relies on this equivalence (only record ORDER may differ).

The sorted walk recovers event times from low-2-bit-masked keys (<= 3 ulp
low), so ranges compare with a matching tolerance; voxel sets compare
exactly.  Adversarial geometry: axis-aligned rays (zero direction
components), diagonal rays through exact voxel corners (simultaneous
crossings -> tie-break), zero-length rays, boundary start fractions.
"""

import numpy as np
import pytest

from ohm_tpu.ops.ddawalk import walk_rays, walk_rays_unordered

RES = 0.1
S = 32


def _make_batch(deltas, fracs_start=None, fracs_end=None, seed=0):
    """Build walk inputs from integer voxel deltas + local fractions."""
    rng = np.random.default_rng(seed)
    n = len(deltas)
    start_abs = rng.integers(-50, 50, (n, 3)).astype(np.int32)
    deltas = np.asarray(deltas, np.int64)
    end_abs = (start_abs + deltas).astype(np.int32)
    if fracs_start is None:
        fracs_start = rng.uniform(-0.49, 0.49, (n, 3)) * RES
    if fracs_end is None:
        fracs_end = rng.uniform(-0.49, 0.49, (n, 3)) * RES
    start = start_abs * RES + fracs_start
    end = end_abs * RES + fracs_end
    vec = (end - start).astype(np.float64)
    length = np.linalg.norm(vec, axis=1)
    direction = np.where(length[:, None] > 0, vec / np.maximum(length, 1e-30)[:, None], 0.0)
    return (start_abs, end_abs, np.float32(fracs_start), np.float32(direction),
            np.float32(length))


def _records(walk):
    """Per-ray sorted (voxel, enter, exit) record lists for comparison."""
    voxels = np.asarray(walk["voxels"])
    enters = np.asarray(walk["enters"])
    exits = np.asarray(walk["exits"])
    valid = np.asarray(walk["valid"])
    out = []
    for r in range(voxels.shape[0]):
        v = voxels[r][valid[r]]
        en = enters[r][valid[r]]
        ex = exits[r][valid[r]]
        order = np.lexsort((v[:, 2], v[:, 1], v[:, 0]))
        out.append((v[order], en[order], ex[order]))
    return out


def _assert_equivalent(batch):
    sa, ea, fr, d, ln = batch
    sorted_walk = walk_rays(sa, ea, fr, d, ln, RES, S, total_cap=3 * S)
    unordered = walk_rays_unordered(sa, ea, fr, d, ln, RES, S)
    rs = _records(sorted_walk)
    ru = _records(unordered)
    assert not np.asarray(sorted_walk["overflow"]).any()
    assert not np.asarray(unordered["overflow"]).any()
    for r, ((vs, ens, exs), (vu, enu, exu)) in enumerate(zip(rs, ru)):
        np.testing.assert_array_equal(vs, vu, err_msg=f"ray {r} voxel set")
        # Sorted-walk times are low-2-bit masked: <= 3 ulp low.
        np.testing.assert_allclose(enu, ens, rtol=3e-6, atol=3e-6,
                                   err_msg=f"ray {r} enters")
        np.testing.assert_allclose(exu, exs, rtol=3e-6, atol=3e-6,
                                   err_msg=f"ray {r} exits")
    np.testing.assert_allclose(np.asarray(unordered["end_enter"]),
                               np.asarray(sorted_walk["end_enter"]),
                               rtol=3e-6, atol=3e-6)


def test_random_rays_match_sorted_walk():
    rng = np.random.default_rng(11)
    deltas = rng.integers(-(S - 2), S - 1, (64, 3))
    _assert_equivalent(_make_batch(deltas, seed=1))


def test_axis_aligned_and_planar_rays():
    deltas = [[20, 0, 0], [0, -20, 0], [0, 0, 20], [-31, 0, 0],
              [15, 15, 0], [0, -12, 12], [9, 0, -9]]
    _assert_equivalent(_make_batch(deltas, seed=2))


def test_corner_ties_diagonal():
    """Rays along exact diagonals from voxel centres cross corners, making
    two or three axes' events simultaneous — tie-break order must agree."""
    deltas = [[10, 10, 10], [-10, -10, -10], [8, 8, -8], [-6, 6, 6],
              [12, 12, 0], [0, -14, -14]]
    n = len(deltas)
    zero = np.zeros((n, 3))
    _assert_equivalent(_make_batch(deltas, fracs_start=zero, fracs_end=zero,
                                   seed=3))


def test_zero_length_and_same_voxel():
    deltas = [[0, 0, 0]] * 4
    batch = _make_batch(deltas, seed=4)
    _assert_equivalent(batch)
    unordered = walk_rays_unordered(*batch, RES, S)
    assert not np.asarray(unordered["valid"]).any()  # no crossings at all


def test_boundary_fractions():
    """Start/end fractions at the voxel wall (+-res/2) — events at t=0."""
    rng = np.random.default_rng(5)
    deltas = rng.integers(-20, 21, (16, 3))
    half = 0.5 * RES - 1e-7
    fr_s = np.full((16, 3), -half)
    fr_e = np.full((16, 3), half)
    _assert_equivalent(_make_batch(deltas, fracs_start=fr_s, fracs_end=fr_e,
                                   seed=5))


def test_origin_record_flag():
    """'first' marks exactly the ray-origin voxel record."""
    rng = np.random.default_rng(6)
    deltas = rng.integers(-20, 21, (32, 3))
    batch = _make_batch(deltas, seed=6)
    sa = batch[0]
    unordered = walk_rays_unordered(*batch, RES, S)
    voxels = np.asarray(unordered["voxels"])
    valid = np.asarray(unordered["valid"])
    first = np.asarray(unordered["first"])
    assert not (first & ~valid).any()
    for r in range(len(deltas)):
        fv = voxels[r][first[r]]
        if len(fv):
            np.testing.assert_array_equal(
                fv, np.broadcast_to(sa[r], fv.shape))
        at_origin = valid[r] & (voxels[r] == sa[r]).all(-1)
        assert first[r].sum() == at_origin.sum()
