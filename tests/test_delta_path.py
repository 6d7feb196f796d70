"""Delta fast-path coverage (ops.integrate.apply_delta).

The delta path (sort + blocked-cummax reduce + i64 compaction sort + sorted
scatter-add into the -0.0-encoded arena + unconditional clamp) only routes
when scatter_cap > 0 (see ops.integrate.delta_path_ok); these tests pin it
against the split-phase pipeline and the f64 oracle on the same ray sets,
including hit+miss-on-one-voxel, clamp-engaged, and zero-net-delta cases,
and assert the over-cap overflow surfaces in stats['dropped_updates'].
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import OCCUPANCY_LAYER
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.oracle.occupancy import RayMapperOccupancy

from test_tpu_integrate import box_room_rays, compare_occupancy


def occupancy_dict(m):
    out = {}
    for key in m.chunks:
        r = m.region(key)
        out[key] = np.array(r.layers[m.layer_index(OCCUPANCY_LAYER)][OCCUPANCY_LAYER])
    return out


def integrate(rays, scatter_cap, repeats=1, setup=None, validate=True,
              capacity=128):
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    if setup is not None:
        setup(m)
    mapper = TpuRayMapper(m, capacity=capacity, validate=validate,
                          scatter_cap=scatter_cap,
                          delta_path=scatter_cap not in (0, "auto"))
    for _ in range(repeats):
        mapper.integrate_rays(rays)
    mapper.sync_voxels()
    return m, mapper


def assert_same_maps(a, b):
    da, db = occupancy_dict(a), occupancy_dict(b)
    assert set(da) == set(db)
    for key in da:
        np.testing.assert_array_equal(da[key], db[key])


def test_delta_matches_split_phase_box_room():
    rng = np.random.default_rng(7)
    rays = box_room_rays(256, rng)
    m_delta, mapper = integrate(rays, scatter_cap=1 << 18)
    m_split, _ = integrate(rays, scatter_cap=0)
    assert mapper.stats["dropped_updates"] == 0
    assert_same_maps(m_delta, m_split)


def test_delta_matches_oracle():
    rng = np.random.default_rng(11)
    rays = box_room_rays(200, rng)
    m_delta, _ = integrate(rays, scatter_cap=1 << 18)
    cpu = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    RayMapperOccupancy(cpu).integrate_rays(rays)
    compare_occupancy(cpu, m_delta)


def test_delta_hit_and_miss_same_voxel():
    # Two collinear rays: the short ray's SAMPLE voxel is a pass-through
    # (miss) voxel of the long ray, so one voxel accumulates hit+miss in one
    # batch.
    rays = np.array([
        [0.0, 0.1, 0.1], [1.05, 0.1, 0.1],   # sample voxel at x=1.05
        [0.0, 0.1, 0.1], [2.05, 0.1, 0.1],   # passes through it as a miss
    ])
    m_delta, _ = integrate(rays, scatter_cap=1 << 12)
    m_split, _ = integrate(rays, scatter_cap=0)
    assert_same_maps(m_delta, m_split)
    m = m_delta
    v = m.voxel_value(point=[1.05, 0.1, 0.1])
    expect = np.float32(m.hit_value) + np.float32(m.miss_value)
    assert v == pytest.approx(float(expect), abs=1e-6)


def test_delta_zero_net_delta_marks_observed():
    # Symmetric hit/miss values: one hit + one miss nets an exactly-0.0
    # delta, which must still mark the voxel OBSERVED with value 0 (the
    # -0.0 + +0.0 == +0.0 encoding), not leave it unobserved.
    def setup(m):
        m.hit_value = 0.5
        m.miss_value = -0.5

    rays = np.array([
        [0.0, 0.1, 0.1], [1.05, 0.1, 0.1],
        [0.0, 0.1, 0.1], [2.05, 0.1, 0.1],
    ])
    m_delta, _ = integrate(rays, scatter_cap=1 << 12, setup=setup)
    m_split, _ = integrate(rays, scatter_cap=0, setup=setup)
    assert np.float32(m_delta.hit_value) == -np.float32(m_delta.miss_value)
    v = m_delta.voxel_value(point=[1.05, 0.1, 0.1])
    assert v == 0.0 and not np.isinf(v)
    assert_same_maps(m_delta, m_split)


def test_delta_clamp_engages():
    # Repeated hits exceed max_value; repeated misses exceed min_value.  The
    # delta path's unconditional clamp must agree with the split-phase
    # one-sided clamp at batch granularity.
    rays = np.array([[0.0, 0.1, 0.1], [3.05, 0.1, 0.1]])
    m_delta, _ = integrate(rays, scatter_cap=1 << 12, repeats=12)
    m_split, _ = integrate(rays, scatter_cap=0, repeats=12)
    assert_same_maps(m_delta, m_split)
    m = m_delta
    assert m.voxel_value(point=[3.05, 0.1, 0.1]) == pytest.approx(m.max_voxel_value)
    assert m.voxel_value(point=[1.05, 0.1, 0.1]) == pytest.approx(m.min_voxel_value)


def test_delta_over_cap_surfaces_dropped_updates():
    rng = np.random.default_rng(13)
    rays = box_room_rays(128, rng)
    m, mapper = integrate(rays, scatter_cap=64, validate=False)
    assert mapper.stats["dropped_updates"] > 0
    with pytest.raises(AssertionError, match="scatter_cap"):
        integrate(rays, scatter_cap=64, validate=True)


# --------------------------------------------------------------------------- #
# Compacted deposit (scatter_cap > 0 WITHOUT delta_path): the split-phase
# dense apply pulls voxel-last records to the stream front with a
# payload-carrying sort and scatters only scatter_cap rows (ops.integrate
# _apply_occupancy_dense).  Semantics must be identical to the uncapped
# deposit; overflow surfaces in dropped_updates.


def integrate_compact(_unused, scatter_cap, validate=True, capacity=128,
                      flags=MapFlag.NONE):
    m = OccupancyMap(resolution=0.25, flags=flags)
    mapper = TpuRayMapper(m, capacity=capacity, validate=validate,
                          scatter_cap=scatter_cap, delta_path=False)
    mapper.integrate_rays(box_room_rays(256, np.random.default_rng(7)))
    mapper.sync_voxels()
    return m, mapper


def test_compact_deposit_matches_uncapped():
    m_c, mp = integrate_compact(None, scatter_cap=1 << 18)
    m_u, _ = integrate_compact(None, scatter_cap=0)
    assert mp.stats["dropped_updates"] == 0
    assert_same_maps(m_c, m_u)


def test_compact_deposit_with_traversal_matches_uncapped():
    flags = MapFlag.TRAVERSAL
    m_c, mp = integrate_compact(None, scatter_cap=1 << 18, flags=flags)
    m_u, _ = integrate_compact(None, scatter_cap=0, flags=flags)
    assert mp.stats["dropped_updates"] == 0
    assert_same_maps(m_c, m_u)
    ti = m_c.layer_index("traversal")
    for key in m_c.chunks:
        a = m_c.region(key).layers[ti]["traversal"]
        b = m_u.region(key).layers[ti]["traversal"]
        np.testing.assert_array_equal(a, b)


def test_compact_deposit_over_cap_surfaces():
    m, mapper = integrate_compact(None, scatter_cap=64, validate=False)
    assert mapper.stats["dropped_updates"] > 0


def test_auto_scatter_cap_sizes_from_fourth_batch():
    """Auto cap sizing waits for the fourth batch: first-batch touched on an
    empty map overshoots steady state several-fold, which sized the cap past
    the stream length and silently disabled deposit compaction."""
    rng = np.random.default_rng(7)
    rays = box_room_rays(256, rng)
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=128, validate=True)  # scatter_cap="auto"
    m_u = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mp_u = TpuRayMapper(m_u, capacity=128, scatter_cap=0)
    for i in range(5):
        mapper.integrate_rays(rays)
        mp_u.integrate_rays(rays)
        if i < 3:
            assert mapper.scatter_cap == 0  # early batches run uncapped
    assert mapper.scatter_cap > 0  # sized from the fourth batch's touched
    mapper.sync_voxels()
    assert mapper.stats["dropped_updates"] == 0
    # Exactness vs a fully uncapped mapper on the same stream.
    mp_u.sync_voxels()
    assert_same_maps(m, m_u)
