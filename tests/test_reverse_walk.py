"""kRfReverseWalk resolution (reference: ohm/RayFlag.h:54).

The reference traces sample->sensor purely to decorrelate CAS write
contention; its walk swaps start/end keys first so per-voxel geometry is
identical either way (ohmgpu/gpu/LineWalk.cl:245-263, TsdfUpdate.cl:139).
The sort-reduce pipeline has no contention and one deterministic per-voxel
order, so REVERSE_WALK is accepted and stripped — results must be
bit-identical to the default — while the one order-dependent combination
(with STOP_ON_FIRST_OCCUPIED) is rejected loudly, as the reference does for
its stop-on-occupied users (ohm/ClearingPattern.cpp:42).
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.rayflags import RayFlag, normalize_reverse_walk
from ohm_tpu.core.layout import OCCUPANCY_LAYER, TSDF_LAYER
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
from ohm_tpu.oracle.occupancy import RayMapperOccupancy


def _scene(n=64, rng=None):
    rng = rng or np.random.default_rng(3)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.min(np.where(dirs != 0, np.array([4.0, 4.0, 2.5]) / np.abs(dirs),
                        np.inf), axis=1)
    rays = np.zeros((2 * n, 3))
    rays[1::2] = dirs * t[:, None]
    return rays


def _layer(m, layer, member):
    li = m.layer_index(layer)
    return {(k, member): c.layers[li][member].copy()
            for k, c in m.chunks.items()}


def test_normalize_semantics():
    assert normalize_reverse_walk(RayFlag.REVERSE_WALK) == 0
    combo = RayFlag.REVERSE_WALK | RayFlag.EXCLUDE_ORIGIN
    assert normalize_reverse_walk(combo) == RayFlag.EXCLUDE_ORIGIN
    with pytest.raises(ValueError):
        normalize_reverse_walk(RayFlag.REVERSE_WALK
                               | RayFlag.STOP_ON_FIRST_OCCUPIED)


@pytest.mark.parametrize("cls,layer,member", [
    (TpuRayMapper, OCCUPANCY_LAYER, OCCUPANCY_LAYER),
    (TpuTsdfMap, TSDF_LAYER, "distance"),
])
def test_reverse_walk_bit_identical(cls, layer, member):
    rays = _scene()
    vals = []
    for fl in (0, int(RayFlag.REVERSE_WALK)):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        mp = cls(m, capacity=64)
        mp.integrate_rays(rays, ray_update_flags=fl)
        mp.sync_voxels()
        vals.append(_layer(m, layer, member))
    a, b = vals
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_reverse_walk_oracle_matches_and_rejects():
    rays = _scene()
    maps = []
    for fl in (0, int(RayFlag.REVERSE_WALK)):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        RayMapperOccupancy(m).integrate_rays(rays, ray_update_flags=fl)
        maps.append(_layer(m, OCCUPANCY_LAYER, OCCUPANCY_LAYER))
    a, b = maps
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    with pytest.raises(ValueError):
        RayMapperOccupancy(m).integrate_rays(
            rays, ray_update_flags=RayFlag.REVERSE_WALK
            | RayFlag.STOP_ON_FIRST_OCCUPIED)
    with pytest.raises(ValueError):
        TpuRayMapper(m, capacity=64).integrate_rays(
            rays, ray_update_flags=RayFlag.REVERSE_WALK
            | RayFlag.STOP_ON_FIRST_OCCUPIED)
