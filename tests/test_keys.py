"""Key/coordinate quantisation tests (reference analogue: tests/ohmtest/KeyTests.cpp)."""

import numpy as np
import pytest

from ohm_tpu.core import keys as keymath
from ohm_tpu.core.map import OccupancyMap, MapFlag


def test_region_coord_quantisation():
    # Regions are centred on coord * size: [-size/2, size/2) -> region 0.
    size = 3.2
    assert keymath.point_to_region_coord(0.0, size) == 0
    assert keymath.point_to_region_coord(size / 2 - 1e-9, size) == 0
    assert keymath.point_to_region_coord(size / 2, size) == 1
    assert keymath.point_to_region_coord(-size / 2 - 1e-9, size) == -1
    assert keymath.point_to_region_coord(-size / 2, size) == 0


def test_voxel_key_round_trip():
    m = OccupancyMap(resolution=0.25, region_voxel_dims=32, flags=MapFlag.NONE)
    rng = np.random.default_rng(42)
    pts = rng.uniform(-50, 50, size=(1000, 3))
    region, local = m.voxel_key(pts)
    assert local.min() >= 0 and local.max() < 32
    centres = m.voxel_centre_global(region, local)
    # Each point must lie within its voxel bounds.
    assert np.all(np.abs(pts - centres) <= 0.5 * m.resolution + 1e-9)
    # Re-quantising the centre must give the same key.
    region2, local2 = m.voxel_key(centres)
    np.testing.assert_array_equal(region, region2)
    np.testing.assert_array_equal(local, local2)


def test_voxel_key_with_origin():
    m = OccupancyMap(resolution=0.1, origin=(10.0, -5.0, 2.5), flags=MapFlag.NONE)
    region, local = m.voxel_key(np.array(m.origin))
    centre = m.voxel_centre_global(region, local)
    assert np.all(np.abs(centre - (m.origin + 0.05)) < 1e-9)


def test_abs_coordinate_round_trip():
    rng = np.random.default_rng(0)
    region = rng.integers(-1000, 1000, size=(500, 3))
    local = rng.integers(0, 32, size=(500, 3))
    dims = np.array([32, 32, 32])
    abs_coord = keymath.key_to_abs(region, local, dims)
    r2, l2 = keymath.abs_to_key(abs_coord, dims)
    np.testing.assert_array_equal(region, r2)
    np.testing.assert_array_equal(local, l2)


def test_voxel_index_linearisation():
    # x + y*dimx + z*dimx*dimy ordering (serialisation load-bearing).
    dims = np.array([32, 32, 32])
    assert keymath.voxel_index(np.array([1, 0, 0]), dims) == 1
    assert keymath.voxel_index(np.array([0, 1, 0]), dims) == 32
    assert keymath.voxel_index(np.array([0, 0, 1]), dims) == 1024
    idx = keymath.voxel_index(np.array([5, 7, 11]), dims)
    np.testing.assert_array_equal(keymath.local_key_from_index(idx, dims), [5, 7, 11])


def test_pack_region_key_round_trip():
    rng = np.random.default_rng(7)
    region = rng.integers(-32768, 32768, size=(1000, 3))
    packed = keymath.pack_region_key(region)
    np.testing.assert_array_equal(keymath.unpack_region_key(packed), region)
    # Packing must be injective over the int16 domain.
    assert len(np.unique(packed)) == len(np.unique(region, axis=0))


def test_neighbouring_voxel_keys_step_regions():
    m = OccupancyMap(resolution=0.5, region_voxel_dims=8, flags=MapFlag.NONE)
    # Walk a straight line of voxel centres; abs coords must increment by 1.
    pts = np.stack([np.arange(100) * 0.5 + 0.25, np.zeros(100), np.zeros(100)], axis=-1)
    region, local = m.voxel_key(pts)
    abs_coord = keymath.key_to_abs(region, local, m.region_voxel_dims)
    np.testing.assert_array_equal(np.diff(abs_coord[:, 0]), 1)


def test_key_range_iteration():
    """KeyRange box iteration, x-fastest (reference: ohm/KeyRange.h)."""
    from ohm_tpu.core.keys import key_range, range_between, abs_to_key

    dims = np.array([32, 32, 32])
    r0, l0 = abs_to_key(np.array([30, 31, 0]), dims)   # crosses a region edge
    r1, l1 = abs_to_key(np.array([33, 33, 1]), dims)
    assert tuple(range_between(r0, l0, r1, l1, dims)) == (3, 2, 1)
    regions, locals_ = key_range(r0, l0, r1, l1, dims)
    assert len(regions) == 4 * 3 * 2
    # First step advances x; region rollover happens at x=32.
    abs_all = regions.astype(np.int64) * dims + locals_
    assert tuple(abs_all[0]) == (30, 31, 0)
    assert tuple(abs_all[1]) == (31, 31, 0)
    assert tuple(abs_all[2]) == (32, 31, 0)
    assert tuple(abs_all[-1]) == (33, 33, 1)
    # Degenerate: inverted range is empty.
    empty_r, _ = key_range(r1, l1, r0, l0, dims)
    assert len(empty_r) == 0
