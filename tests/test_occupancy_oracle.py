"""Occupancy oracle semantics (reference analogue: tests/ohmtest/MapTests.cpp).

Checks hit/miss log-odds accumulation, clamping, saturation, flag matrix and
voxel mean / traversal / touch time / incident normal side layers.
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import MEAN_LAYER, TRAVERSAL_LAYER
from ohm_tpu.core.probability import probability_to_value, value_to_probability
from ohm_tpu.core.rayflags import RayFlag
from ohm_tpu.oracle.occupancy import RayMapperOccupancy
from ohm_tpu.core import subvoxel


def make_map(**kwargs):
    kwargs.setdefault("resolution", 0.25)
    kwargs.setdefault("flags", MapFlag.NONE)
    return OccupancyMap(**kwargs)


def test_single_hit_and_miss_values():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays)

    # Sample voxel got one hit.
    assert m.voxel_value(point=[2.0, 0, 0]) == pytest.approx(m.hit_value, abs=1e-6)
    # Intermediate voxel got one miss.
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(m.miss_value, abs=1e-6)
    # Origin voxel also a miss.
    assert m.voxel_value(point=[0.05, 0.05, 0.05]) == pytest.approx(m.miss_value, abs=1e-6)
    # Probability round trip sanity.
    assert value_to_probability(m.hit_value) == pytest.approx(0.9, abs=1e-6)


def test_hit_accumulation_and_clamp():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    # Same-voxel repeated hits: origin==sample voxel differs; use a short ray.
    ray = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    for _ in range(10):
        mapper.integrate_rays(ray)
    # Clamped at max_voxel_value (3.511 default).
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(m.max_voxel_value, abs=1e-5)


def test_miss_clamp():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    ray = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    for _ in range(30):
        mapper.integrate_rays(ray, ray_update_flags=RayFlag.END_POINT_AS_FREE)
    assert m.voxel_value(point=[0.5, 0, 0]) == pytest.approx(m.min_voxel_value, abs=1e-5)


def test_saturation_freezes_value():
    m = make_map()
    m.saturate_at_max_value = True
    m.max_voxel_value = float(np.float32(m.hit_value))  # saturate after one hit
    mapper = RayMapperOccupancy(m)
    ray = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mapper.integrate_rays(ray)
    v1 = m.voxel_value(point=[1.0, 0, 0])
    # A miss through the saturated voxel must not change it.
    mapper.integrate_rays(np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]]))
    assert m.voxel_value(point=[1.0, 0, 0]) == v1


def test_end_point_as_free():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays, ray_update_flags=RayFlag.END_POINT_AS_FREE)
    assert m.voxel_value(point=[2.0, 0, 0]) == pytest.approx(m.miss_value, abs=1e-6)


def test_exclude_sample_and_ray():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays, ray_update_flags=RayFlag.EXCLUDE_SAMPLE)
    assert np.isinf(m.voxel_value(point=[2.0, 0, 0]))
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(m.miss_value, abs=1e-6)

    m2 = make_map()
    mapper2 = RayMapperOccupancy(m2)
    mapper2.integrate_rays(rays, ray_update_flags=RayFlag.EXCLUDE_RAY)
    assert np.isinf(m2.voxel_value(point=[1.0, 0, 0]))
    assert m2.voxel_value(point=[2.0, 0, 0]) == pytest.approx(m2.hit_value, abs=1e-6)


def test_exclude_origin():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays, ray_update_flags=RayFlag.EXCLUDE_ORIGIN)
    assert np.isinf(m.voxel_value(point=[0.05, 0.05, 0.05]))
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(m.miss_value, abs=1e-6)


def test_exclude_unobserved_preserves_state():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays, ray_update_flags=RayFlag.EXCLUDE_UNOBSERVED)
    # Nothing was previously observed: no voxel may change.
    assert np.isinf(m.voxel_value(point=[1.0, 0, 0]))
    assert np.isinf(m.voxel_value(point=[2.0, 0, 0]))


def test_stop_on_first_occupied():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    # Build an occupied wall at x = 1.
    wall_ray = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    for _ in range(3):
        mapper.integrate_rays(wall_ray)
    occupied_before = m.voxel_value(point=[1.0, 0, 0])
    assert occupied_before >= m.occupancy_threshold_value

    # A clearing ray through the wall: stops at the wall, so voxels beyond
    # must be untouched and no sample hit applied.
    long_ray = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(long_ray, ray_update_flags=RayFlag.STOP_ON_FIRST_OCCUPIED | RayFlag.EXCLUDE_SAMPLE)
    assert np.isinf(m.voxel_value(point=[1.5, 0, 0]))
    assert np.isinf(m.voxel_value(point=[2.0, 0, 0]))
    # The wall itself still received the miss before the stop flag tripped.
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(occupied_before + np.float32(m.miss_value), abs=1e-5)


def test_voxel_mean_layer():
    m = make_map(flags=MapFlag.VOXEL_MEAN)
    mapper = RayMapperOccupancy(m)
    target = np.array([1.03, 0.07, -0.02])
    rays = np.array([[0.0, 0.0, 0.0], target])
    mapper.integrate_rays(rays)
    region, local = m.voxel_key(target)
    chunk = m.region(region)
    idx = int(m.voxel_index(local))
    mean_arr = chunk.layers[m.layer_index(MEAN_LAYER)]
    assert mean_arr["count"][idx] == 1
    decoded = subvoxel.sub_voxel_to_local_coord(mean_arr["coord"][idx], m.resolution)
    centre = m.voxel_centre_global(region, local)
    np.testing.assert_allclose(centre + decoded, target, atol=m.resolution / 1023 + 1e-6)


def test_traversal_layer_accumulates_length():
    m = make_map(flags=MapFlag.TRAVERSAL)
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    mapper.integrate_rays(rays)
    # Sum of traversal over all touched voxels ~ ray length.
    total = 0.0
    for chunk in m:
        total += chunk.layers[m.layer_index(TRAVERSAL_LAYER)]["traversal"].sum()
    assert total == pytest.approx(2.0, abs=1e-5)


def test_bad_rays_filtered():
    m = make_map()
    mapper = RayMapperOccupancy(m)
    rays = np.array([
        [0.0, 0.0, 0.0], [np.nan, 0.0, 0.0],
        [0.0, 0.0, 0.0], [np.inf, 0.0, 0.0],
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
    ])
    mapper.integrate_rays(rays)
    # Only the good ray integrated.
    assert m.voxel_value(point=[1.0, 0, 0]) == pytest.approx(m.hit_value, abs=1e-6)
    assert m.region_count() >= 1


def test_timestamps_touch_time():
    m = make_map(flags=MapFlag.TOUCH_TIME)
    mapper = RayMapperOccupancy(m)
    rays = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mapper.integrate_rays(rays, timestamps=np.array([100.0]))
    mapper.integrate_rays(rays, timestamps=np.array([101.5]))
    assert m.first_ray_time == 100.0
    region, local = m.voxel_key([1.0, 0, 0])
    chunk = m.region(region)
    idx = int(m.voxel_index(local))
    touch = chunk.layers[m.layer_index("touch_time")]["touch"][idx]
    assert subvoxel.decode_touch_time(m.first_ray_time, touch) == pytest.approx(101.5, abs=0.002)


def test_clip_bounded_filter_semantics():
    """AABB clip filter (reference: ohm/RayFilter.cpp:60-78 clipBounded):
    rays clip to the box, outside voxels stay unobserved, and a clipped
    sample end integrates as FREE, not a hit."""
    from ohm_tpu.core.filters import clip_bounded_filter
    from ohm_tpu.core.rayflags import RayFilterFlag

    box_min, box_max = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
    starts = np.array([[0.0, 0, 0], [0.0, 0, 0], [3.0, 3, 3]])
    ends = np.array([[5.0, 0, 0], [0.5, 0, 0], [4.0, 4, 4]])
    s2, e2, flags, ok = clip_bounded_filter(starts, ends, box_min, box_max)
    assert ok[0] and ok[1] and not ok[2]  # fully-outside ray rejected
    np.testing.assert_allclose(e2[0], [1.0, 0, 0])  # clipped to the box wall
    assert flags[0] & RayFilterFlag.CLIPPED_END
    assert flags[1] == 0  # untouched ray unflagged

    m = OccupancyMap(resolution=0.2)
    m.ray_filter = lambda s, e: clip_bounded_filter(s, e, box_min, box_max)
    mapper = RayMapperOccupancy(m)
    mapper.integrate_rays(np.array([[0.0, 0, 0], [5.0, 0, 0]]))
    # Clipped end voxel (wall at x=1) integrates as free, not occupied.
    assert m.voxel_value(point=[0.9, 0, 0]) < 0
    # Beyond the box: unobserved.
    assert not np.isfinite(m.voxel_value(point=[1.5, 0, 0]))
    assert not np.isfinite(m.voxel_value(point=[4.9, 0, 0]))
