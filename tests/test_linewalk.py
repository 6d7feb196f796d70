"""DDA line walk oracle tests (reference analogue: tests/ohmtest/LineWalkTests.cpp).

The key invariants checked by the reference suite: the walk visits a
connected 6-neighbour chain from the start to the end voxel, enter/exit
ranges are monotonic and partition the segment, and start/end exclusion
flags behave.
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.oracle import linewalk


def collect_walk(m, start, end, flags=0):
    visits = []

    def visit(abs_key, marker, enter, exit_):
        visits.append((abs_key.copy(), marker, enter, exit_))
        return True

    count = linewalk.walk_segment_keys(m, start, end, visit, flags)
    return visits, count


@pytest.fixture
def small_map():
    return OccupancyMap(resolution=0.25, region_voxel_dims=16, flags=MapFlag.NONE)


def test_walk_connectivity_and_ranges(small_map):
    rng = np.random.default_rng(123)
    for _ in range(50):
        start = rng.uniform(-5, 5, 3)
        end = rng.uniform(-5, 5, 3)
        visits, _count = collect_walk(small_map, start, end)
        assert visits, "walk must visit at least the end voxel"
        keys = np.array([v[0] for v in visits])
        # 6-connected chain: one axis steps by exactly 1 between visits.
        if len(keys) > 1:
            steps = np.abs(np.diff(keys, axis=0)).sum(axis=1)
            assert np.all(steps == 1), f"non 6-connected step for ray {start}->{end}"
        # First voxel contains start, last contains end.
        sr, sl = small_map.voxel_key(start)
        er, el = small_map.voxel_key(end)
        from ohm_tpu.core.keys import key_to_abs

        np.testing.assert_array_equal(keys[0], key_to_abs(sr, sl, small_map.region_voxel_dims))
        np.testing.assert_array_equal(keys[-1], key_to_abs(er, el, small_map.region_voxel_dims))
        # Enter/exit ranges monotone, non-negative, bounded by length.
        length = np.linalg.norm(end - start)
        enters = np.array([v[2] for v in visits])
        exits = np.array([v[3] for v in visits])
        assert np.all(exits[:-1] >= enters[:-1] - 1e-9)
        assert enters[0] == 0.0
        assert abs(exits[-1] - length) < 1e-9
        # Each voxel's exit = next voxel's enter.
        np.testing.assert_allclose(exits[:-1], enters[1:], atol=1e-12)


def test_walk_single_voxel(small_map):
    start = np.array([0.1, 0.1, 0.1])
    end = np.array([0.12, 0.11, 0.13])
    visits, count = collect_walk(small_map, start, end)
    assert count == 1
    assert len(visits) == 1
    assert visits[0][1] == linewalk.MARKER_END


def test_walk_axis_aligned(small_map):
    res = small_map.resolution
    start = np.array([res * 0.5, res * 0.5, res * 0.5])
    end = start + np.array([10 * res, 0, 0])
    visits, count = collect_walk(small_map, start, end)
    assert count == 11
    keys = np.array([v[0] for v in visits])
    np.testing.assert_array_equal(np.diff(keys[:, 0]), 1)
    np.testing.assert_array_equal(np.diff(keys[:, 1]), 0)
    np.testing.assert_array_equal(np.diff(keys[:, 2]), 0)


def test_walk_exclusion_flags(small_map):
    start = np.array([0.0, 0.0, 0.0])
    end = np.array([3.0, 1.0, 0.5])
    full, n_full = collect_walk(small_map, start, end)
    no_start, n_no_start = collect_walk(small_map, start, end, linewalk.EXCLUDE_START_VOXEL)
    no_end, n_no_end = collect_walk(small_map, start, end, linewalk.EXCLUDE_END_VOXEL)
    # Visit count bookkeeping matches the reference: exclusions still count.
    assert n_no_start == n_full
    assert n_no_end == n_full - 1
    assert len(no_start) == len(full) - 1
    np.testing.assert_array_equal(no_start[0][0], full[1][0])
    assert len(no_end) == len(full) - 1
    np.testing.assert_array_equal(no_end[-1][0], full[-2][0])


def test_walk_reverse_symmetry(small_map):
    # Walking end->start visits the same voxel set (in reverse order).
    rng = np.random.default_rng(5)
    for _ in range(20):
        start = rng.uniform(-3, 3, 3)
        end = rng.uniform(-3, 3, 3)
        fwd, _ = collect_walk(small_map, start, end)
        rev, _ = collect_walk(small_map, end, start)
        fwd_keys = {tuple(v[0]) for v in fwd}
        rev_keys = {tuple(v[0]) for v in rev}
        # Voxel sets may differ by at most boundary-crossing voxels; the
        # reference makes the same no-guarantee, but endpoints must agree.
        assert tuple(fwd[0][0]) in rev_keys
        assert tuple(fwd[-1][0]) in rev_keys
        assert tuple(rev[0][0]) in fwd_keys


def test_walk_early_termination(small_map):
    start = np.array([0.0, 0.0, 0.0])
    end = np.array([5.0, 0.0, 0.0])
    visits = []

    def visit(abs_key, marker, enter, exit_):
        visits.append(abs_key.copy())
        return len(visits) < 3  # abort after 3 voxels

    linewalk.walk_segment_keys(small_map, start, end, visit)
    assert len(visits) == 3
