"""ShardedRayFlowMapper: the PRODUCTION pipeline (rayflow wire, dictionary
candidates, in-jit all_to_all routing) on the virtual 8-device CPU mesh,
pinned against the single-chip mappers (VERDICT r3 item 5: one pipeline).

Occupancy must be BIT-identical (per-voxel hit/miss counts are complete on
the owner shard, and the dense sweep is deterministic); NDT/TSDF match at
the same 1e-5 the segmented sharded tests use.
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.parallel.rayflow import ShardedRayFlowMapper

# Multi-device virtual-mesh suites are the heaviest CPU files (~5.5 min
# combined); the default run covers sharding via dryrun_multichip smoke in
# CI and these run under OHM_TEST_SLOW=1 (round-5 VERDICT item 5).
pytestmark = pytest.mark.slow


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:N_DEV])
    return Mesh(devices, axis_names=("shard",))


def _scene(n_rays=256, seed=3):
    rng = np.random.default_rng(seed)
    rays = rng.uniform(-6, 6, (2 * n_rays, 3))
    rays[0::2] *= 0.05
    return rays


def _map_voxels(m, layer, member):
    li = m.layer_index(layer)
    vals = {}
    for key, chunk in m.chunks.items():
        a = chunk.layers[li][member]
        for i in np.flatnonzero(np.isfinite(a) & (a != 0)):
            vals[(key, int(i))] = float(a[i])
    return vals


def _occ_voxels(m):
    li = m.layer_index("occupancy")
    vals = {}
    for key, chunk in m.chunks.items():
        occ = chunk.layers[li]["occupancy"]
        for i in np.flatnonzero(np.isfinite(occ)):
            vals[(key, int(i))] = float(occ[i])
    return vals


def test_rayflow_sharded_occupancy_bit_identical(mesh):
    rng = np.random.default_rng(29)
    batches = []
    for _ in range(4):
        rays = rng.uniform(-6, 6, (2 * 192, 3))
        rays[0::2] *= 0.05
        batches.append(rays)

    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayFlowMapper(m_sh, mesh, capacity=64, scatter_pad=1 << 16,
                              validate=True)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuRayMapper(m_ref, capacity=512, scatter_cap=0, rayflow=True)
    for rays in batches:
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst == 0.0, worst
    assert sh.stats["routing_dropped"] == 0


def test_rayflow_sharded_eviction_spill_reload(mesh):
    """Tiny per-shard capacity forces evict+spill+re-upload between batches;
    the final map must still match the single-chip rayflow mapper exactly."""
    from ohm_tpu.parallel.sharded import region_owner

    rng = np.random.default_rng(31)
    cand = np.array([[i, 0, 0] for i in range(48)])
    owners = region_owner(cand, N_DEV)
    shard = next(s for s in range(N_DEV) if (owners == s).sum() >= 2)
    r_a, r_b = cand[owners == shard][:2]

    def cluster(region, n=96):
        centre = np.asarray(region, dtype=float) * 8.0
        rays = rng.uniform(-1.5, 1.5, (2 * n, 3))
        rays[0::2] *= 0.05
        return rays + centre

    batches = [cluster(r_a), cluster(r_b), cluster(r_a), cluster(r_b)]

    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayFlowMapper(m_sh, mesh, capacity=1, scatter_pad=1 << 16)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuRayMapper(m_ref, capacity=512, scatter_cap=0, rayflow=True)
    for rays in batches:
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    assert sh.arena.stats["evictions"] > 0, "scene did not force eviction"
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst == 0.0, worst


def test_rayflow_sharded_ndt_matches_single_device(mesh):
    from ohm_tpu.mapping.ndt_map import TpuNdtMap

    rays = _scene(96, seed=37)
    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayFlowMapper(m_sh, mesh, kind="ndt", capacity=64,
                              scatter_pad=1 << 16)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuNdtMap(m_ref, capacity=512)
    for _ in range(2):
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst < 1e-5, worst
    c_sh = _map_voxels(m_sh, "covariance", "P00")
    c_ref = _map_voxels(m_ref, "covariance", "P00")
    assert set(c_sh) == set(c_ref)
    worst_c = max(abs(c_sh[k] - c_ref[k]) for k in c_ref) if c_ref else 0.0
    assert worst_c < 1e-5, worst_c


def test_rayflow_sharded_tsdf_matches_single_device(mesh):
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap

    rays = _scene(96, seed=41)
    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayFlowMapper(m_sh, mesh, kind="tsdf", capacity=64,
                              scatter_pad=1 << 16)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuTsdfMap(m_ref, capacity=512)
    sh.integrate_rays(rays)
    ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    w_sh = _map_voxels(m_sh, "tsdf", "weight")
    w_ref = _map_voxels(m_ref, "tsdf", "weight")
    assert set(w_sh) == set(w_ref)
    worst = max(abs(w_sh[k] - w_ref[k]) for k in w_ref) if w_ref else 0.0
    assert worst < 1e-5, worst
    d_sh = _map_voxels(m_sh, "tsdf", "distance")
    d_ref = _map_voxels(m_ref, "tsdf", "distance")
    worst_d = max(abs(d_sh[k] - d_ref[k]) for k in d_ref) if d_ref else 0.0
    assert worst_d < 1e-4, worst_d
