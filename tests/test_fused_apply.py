"""Fused row-local apply (ops.integrate.apply_records_fused_jit) differentials.

The fused path replaces the apply phase's two global record sorts with one
row sort over the expand compaction rows plus a duplicate-index integer
scatter-add.  Integer count adds are exact, so occupancy must be
BIT-IDENTICAL to the split-phase pipeline; traversal sums may differ by f32
reassociation across rows only.
"""

import os

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import OCCUPANCY_LAYER, TRAVERSAL_LAYER
from ohm_tpu.mapping.tpu_map import TpuRayMapper


def _box_rays(n, rng, half=(10.0, 10.0, 5.0), sensor=(0.0, 0.0, 0.0)):
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.min(np.where(dirs != 0, np.asarray(half) / np.abs(dirs), np.inf), axis=1)
    rays = np.empty((2 * n, 3), dtype=np.float64)
    rays[0::2] = sensor
    rays[1::2] = np.asarray(sensor) + dirs * t[:, None]
    return rays


def _populate(batches, fused, flags=MapFlag.NONE, rayflow=False, validate=True):
    old_f, old_r = os.environ.get("OHM_FUSED"), os.environ.get("OHM_RAYFLOW")
    os.environ["OHM_FUSED"] = "2" if fused else "0"
    os.environ["OHM_RAYFLOW"] = "1" if rayflow else "0"
    try:
        m = OccupancyMap(resolution=0.1, flags=flags)
        mapper = TpuRayMapper(m, capacity=512, validate=validate)
        for b in batches:
            mapper.integrate_rays(b)
        mapper.sync_voxels()
        return m, mapper
    finally:
        for k, v in (("OHM_FUSED", old_f), ("OHM_RAYFLOW", old_r)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _layer(m, key, name):
    r = m.region(key)
    return r.layers[m.layer_index(name)][name]


@pytest.mark.parametrize("rayflow", [False, True])
def test_fused_bit_identical_occupancy(rayflow):
    rng = np.random.default_rng(7)
    batches = [_box_rays(512, rng) for _ in range(6)]
    m0, _ = _populate(batches, fused=False, rayflow=rayflow)
    m1, mp1 = _populate(batches, fused=True, rayflow=rayflow)
    assert mp1.row_cap > 0, "fused path never activated"
    assert set(m0.chunks) == set(m1.chunks)
    for k in m0.chunks:
        a = _layer(m0, k, OCCUPANCY_LAYER)
        b = _layer(m1, k, OCCUPANCY_LAYER)
        ia, ib = np.isinf(a), np.isinf(b)
        assert (ia == ib).all()
        assert (a[~ia] == b[~ib]).all()


@pytest.mark.slow
def test_fused_traversal_reassociation_only():
    rng = np.random.default_rng(11)
    batches = [_box_rays(512, rng) for _ in range(5)]
    fl = MapFlag.VOXEL_MEAN | MapFlag.TRAVERSAL
    m0, _ = _populate(batches, fused=False, flags=fl)
    m1, _ = _populate(batches, fused=True, flags=fl)
    for k in m0.chunks:
        ta = _layer(m0, k, TRAVERSAL_LAYER)
        tb = _layer(m1, k, TRAVERSAL_LAYER)
        assert np.abs(ta - tb).max() < 2e-4


@pytest.mark.slow
def test_fused_flag_matrix_bit_identical():
    """Fused vs split-phase equality must hold across the RayFlag matrix
    (exclusions run partly in expand, partly in the shared dense sweep)."""
    from ohm_tpu.core.rayflags import RayFlag

    rng = np.random.default_rng(29)
    batches = [_box_rays(512, rng) for _ in range(5)]
    for flags in (RayFlag.END_POINT_AS_FREE,
                  RayFlag.EXCLUDE_ORIGIN | RayFlag.EXCLUDE_SAMPLE,
                  RayFlag.EXCLUDE_FREE,
                  RayFlag.EXCLUDE_OCCUPIED | RayFlag.EXCLUDE_UNOBSERVED):
        maps = []
        for fused in (False, True):
            old = os.environ.get("OHM_FUSED")
            os.environ["OHM_FUSED"] = "2" if fused else "0"
            try:
                m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
                mapper = TpuRayMapper(m, capacity=512, validate=True)
                for b in batches:
                    mapper.integrate_rays(b, ray_update_flags=int(flags))
                mapper.sync_voxels()
                if fused:
                    assert mapper.row_cap > 0
            finally:
                if old is None:
                    os.environ.pop("OHM_FUSED", None)
                else:
                    os.environ["OHM_FUSED"] = old
            maps.append(m)
        m0, m1 = maps
        assert set(m0.chunks) == set(m1.chunks), flags
        for k in m0.chunks:
            a = _layer(m0, k, OCCUPANCY_LAYER)
            b = _layer(m1, k, OCCUPANCY_LAYER)
            ia, ib = np.isinf(a), np.isinf(b)
            assert (ia == ib).all(), flags
            assert (a[~ia] == b[~ib]).all(), flags


@pytest.mark.slow
def test_fused_ndt_bit_identical_occupancy():
    """The NDT std-count fused deposit must reproduce the unfused pipeline's
    occupancy bit-exactly (integer partial counts; the NDT miss deltas are
    untouched by the deposit restructure)."""
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.oracle.ndt import NdtParams

    rng = np.random.default_rng(13)
    batches = [_box_rays(512, rng, half=(4.0, 4.0, 2.0)) for _ in range(6)]

    maps = []
    for fused in (False, True):
        old = os.environ.get("OHM_FUSED")
        os.environ["OHM_FUSED"] = "2" if fused else "0"
        try:
            m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
            mp = TpuNdtMap(m, NdtParams(), capacity=256, validate=True)
            for b in batches:
                mp.integrate_rays(b)
            mp.sync_voxels()
            if fused:
                assert mp.row_cap > 0, "fused NDT deposit never activated"
        finally:
            if old is None:
                os.environ.pop("OHM_FUSED", None)
            else:
                os.environ["OHM_FUSED"] = old
        maps.append(m)
    m0, m1 = maps
    assert set(m0.chunks) == set(m1.chunks)
    for k in m0.chunks:
        a = _layer(m0, k, OCCUPANCY_LAYER)
        b = _layer(m1, k, OCCUPANCY_LAYER)
        ia, ib = np.isinf(a), np.isinf(b)
        assert (ia == ib).all()
        assert (a[~ia] == b[~ib]).all()


def test_fused_row_cap_overflow_counts_drops():
    """An undersized row_cap must surface in dropped_updates, not corrupt."""
    rng = np.random.default_rng(3)
    batches = [_box_rays(512, rng) for _ in range(5)]
    old_f, old_r = os.environ.get("OHM_FUSED"), os.environ.get("OHM_RAYFLOW")
    os.environ["OHM_FUSED"] = "1"
    os.environ["OHM_RAYFLOW"] = "0"
    try:
        m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        mapper = TpuRayMapper(m, capacity=512, validate=False)
        for b in batches[:4]:
            mapper.integrate_rays(b)
        assert mapper.row_cap > 0
        mapper.row_cap = 256  # far below the sized budget
        mapper.integrate_rays(batches[4])
        assert mapper.stats["dropped_updates"] > 0
    finally:
        for k, v in (("OHM_FUSED", old_f), ("OHM_RAYFLOW", old_r)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
