"""Multi-chip sharded integration tests on the virtual 8-device CPU mesh.

Covers both schemes in ohm_tpu.parallel.sharded:
  - replicated: every chip receives the full batch; non-owned records drop
  - routed: segments ship only to the owners of their corner regions
    (reference has nothing comparable - it is single-GPU; the sharded
    invariant is each voxel record applied on exactly one chip)
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.batch import prepare_ray_batch
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.parallel.sharded import (

    ShardedArena,
    check_sharded_coverage,
    make_routed_batch,
    make_sharded_batch,
    sharded_integrate,
    sharded_integrate_routed,
)

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


def _reference_voxels(rays, resolution=0.25):
    m_ref = OccupancyMap(resolution=resolution, flags=MapFlag.NONE)
    ref = TpuRayMapper(m_ref, capacity=256)
    ref.integrate_rays(rays)
    ref.sync_voxels()
    occ_idx = m_ref.layer_index("occupancy")
    vals = {}
    for key, chunk in m_ref.chunks.items():
        occ = chunk.layers[occ_idx]["occupancy"]
        for i in np.flatnonzero(np.isfinite(occ)):
            vals[(key, int(i))] = float(occ[i])
    return vals


def _sharded_voxels(arena, new_state):
    occ_sh = np.asarray(new_state["occupancy"])
    occ_sh = np.where((occ_sh == 0) & np.signbit(occ_sh), np.inf, occ_sh)
    vals = {}
    for s, shard in enumerate(arena.shards):
        V = shard.voxels_per_region
        for key, slot in shard.slot_of.items():
            block = occ_sh[s, slot * V:(slot + 1) * V]
            for i in np.flatnonzero(np.isfinite(block)):
                vals[(key, int(i))] = float(block[i])
    return vals


def test_replicated_matches_single_device(mesh):
    rays = _scene()
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=16)
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)

    arena = ShardedArena(N_DEV, capacity=16, region_shift=mapper.region_shift,
                         layer_names=["occupancy"], mesh=mesh)
    arena.ensure_regions(prepared.region_keys)
    state = arena.device_state()
    batch = make_sharded_batch(prepared, arena, mesh)
    step = sharded_integrate(mesh, mapper._config(0))
    new_state, stats = step(state, batch)
    jax.block_until_ready(new_state["occupancy"])
    check_sharded_coverage(stats)

    vals = _sharded_voxels(arena, new_state)
    ref = _reference_voxels(rays)
    assert set(vals) == set(ref)
    worst = max(abs(vals[k] - ref[k]) for k in ref)
    assert worst < 1e-4


def test_routed_matches_single_device_with_fewer_segments(mesh):
    rays = _scene(n_rays=512, seed=11)
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=32)
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)

    arena = ShardedArena(N_DEV, capacity=32, region_shift=mapper.region_shift,
                         layer_names=["occupancy"], mesh=mesh)
    arena.ensure_regions(prepared.region_keys)
    state = arena.device_state()
    batch, counts = make_routed_batch(prepared, arena, mesh)
    step = sharded_integrate_routed(mesh, mapper._config(0))
    new_state, stats = step(state, batch)
    jax.block_until_ready(new_state["occupancy"])

    # Routing invariant: duplication factor well below full replication.
    total_routed = int(counts.sum())
    assert total_routed < N_DEV * prepared.n_segments * 0.6, (
        f"routing barely reduces work: {total_routed} routed vs "
        f"{N_DEV * prepared.n_segments} replicated")
    assert counts.max() <= batch["ints"].shape[1]

    vals = _sharded_voxels(arena, new_state)
    ref = _reference_voxels(rays)
    assert set(vals) == set(ref), (
        f"routed coverage mismatch: {len(set(vals) - set(ref))} extra, "
        f"{len(set(ref) - set(vals))} missing")
    worst = max(abs(vals[k] - ref[k]) for k in ref)
    assert worst < 1e-4


def test_routed_applied_equals_reference_applied(mesh):
    """Every record applies on exactly one shard: per-shard applied counts
    sum to the single-device applied count."""
    rays = _scene(n_rays=128, seed=5)
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=16)
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)

    # Single-device applied count via the monolithic pipeline stats.
    from ohm_tpu.ops.integrate import integrate_occupancy
    import jax.numpy as jnp
    from ohm_tpu.mapping.batch import fill_corner_slots

    ref_map = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref_mapper = TpuRayMapper(ref_map, capacity=64)
    ref_prepared = prepare_ray_batch(ref_map, rays, segment_length=ref_mapper.segment_length)
    ref_mapper.arena.ensure_regions(ref_prepared.region_keys)
    fill_corner_slots(ref_prepared, ref_mapper.arena.table)
    ref_batch = {k: jnp.asarray(v) for k, v in ref_prepared.arrays.items()}
    _, ref_stats = integrate_occupancy(ref_mapper.arena.device_state(), ref_batch,
                                       ref_mapper._config(0))
    expected = int(ref_stats["applied_updates"])

    arena = ShardedArena(N_DEV, capacity=16, region_shift=mapper.region_shift,
                         layer_names=["occupancy"], mesh=mesh)
    arena.ensure_regions(prepared.region_keys)
    batch, _ = make_routed_batch(prepared, arena, mesh)
    step = sharded_integrate_routed(mesh, mapper._config(0))
    _, stats = step(arena.device_state(), batch)
    from ohm_tpu.parallel.sharded import check_routed_coverage

    check_routed_coverage(stats, expected)


# --------------------------------------------------------------------------- #
# ShardedRayMapper: device-resident arenas, multi-batch, eviction, NDT/TSDF
# (round-3; parallel.mapper).  Semantics bar: exact equality with the
# single-chip mappers on identical ray streams.


def _map_voxels(m, layer="occupancy", member="occupancy"):
    idx = m.layer_index(layer)
    vals = {}
    for key, chunk in m.chunks.items():
        arr = chunk.layers[idx][member]
        for i in np.flatnonzero(np.isfinite(arr) & (arr != 0) if arr.dtype.kind == "f"
                                else arr != 0):
            vals[(key, int(i))] = float(arr[i])
    return vals


def _occ_voxels(m):
    idx = m.layer_index("occupancy")
    vals = {}
    for key, chunk in m.chunks.items():
        occ = chunk.layers[idx]["occupancy"]
        for i in np.flatnonzero(np.isfinite(occ)):
            vals[(key, int(i))] = float(occ[i])
    return vals


def test_resident_mapper_multibatch_matches_single_device(mesh):
    from ohm_tpu.parallel.mapper import ShardedRayMapper

    rng = np.random.default_rng(11)
    batches = []
    for b in range(6):
        rays = rng.uniform(-6, 6, (2 * 128, 3))
        rays[0::2] *= 0.05
        batches.append(rays)

    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayMapper(m_sh, mesh, capacity=64, scatter_pad=1 << 16,
                          validate=True)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuRayMapper(m_ref, capacity=512, scatter_cap=0)
    for rays in batches:
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst < 1e-5, worst
    # Routing must ship fewer segment-copies than full replication.
    st = sh.stats
    assert st["routed_records"] < N_DEV * st["segments"]


def test_resident_mapper_eviction_spill_and_reload(mesh):
    """Per-shard capacity too small for the whole scene: regions spill to the
    host map on eviction and re-upload when revisited; the final map must
    still match the single-chip reference exactly."""
    from ohm_tpu.parallel.mapper import ShardedRayMapper

    from ohm_tpu.parallel.sharded import region_owner

    rng = np.random.default_rng(13)
    # Single-region clusters whose regions COLLIDE on one shard (computed
    # from the ownership hash), alternated with per-shard capacity 1 so the
    # shared shard must evict+spill+re-upload every batch.
    cand = np.array([[i, 0, 0] for i in range(48)])
    owners = region_owner(cand, N_DEV)
    shard = next(s for s in range(N_DEV) if (owners == s).sum() >= 2)
    r_a, r_b = cand[owners == shard][:2]

    def cluster(region, n=64):
        centre = np.asarray(region, dtype=float) * 8.0  # region_spatial = 8
        rays = rng.uniform(-1.5, 1.5, (2 * n, 3))
        rays[0::2] *= 0.05
        return rays + centre

    batches = [cluster(r_a), cluster(r_b), cluster(r_a), cluster(r_b),
               cluster(r_a)]

    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayMapper(m_sh, mesh, capacity=1, scatter_pad=1 << 16)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuRayMapper(m_ref, capacity=512, scatter_cap=0)
    for rays in batches:
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    assert sh.arena.stats["evictions"] > 0, "scene did not force eviction"
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst < 1e-5, worst


def test_resident_mapper_ndt_matches_single_device(mesh):
    from ohm_tpu.parallel.mapper import ShardedRayMapper
    from ohm_tpu.mapping.ndt_map import TpuNdtMap

    rays = _scene(96, seed=17)
    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayMapper(m_sh, mesh, kind="ndt", capacity=64,
                          scatter_pad=1 << 16)
    m_ref = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref = TpuNdtMap(m_ref, capacity=512)
    for b in range(2):
        sh.integrate_rays(rays)
        ref.integrate_rays(rays)
    sh.sync_voxels()
    ref.sync_voxels()
    v_sh, v_ref = _occ_voxels(m_sh), _occ_voxels(m_ref)
    assert set(v_sh) == set(v_ref)
    worst = max(abs(v_sh[k] - v_ref[k]) for k in v_ref)
    assert worst < 1e-5, worst
    # Covariance layer must match too (P00 member spot check).
    c_sh = _map_voxels(m_sh, "covariance", "P00")
    c_ref = _map_voxels(m_ref, "covariance", "P00")
    assert set(c_sh) == set(c_ref)
    worst_c = max(abs(c_sh[k] - c_ref[k]) for k in c_ref) if c_ref else 0.0
    assert worst_c < 1e-5, worst_c


def test_resident_mapper_tsdf_matches_single_device(mesh):
    from ohm_tpu.parallel.mapper import ShardedRayMapper
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap

    rays = _scene(96, seed=19)
    m_sh = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    sh = ShardedRayMapper(m_sh, mesh, kind="tsdf", capacity=64,
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


def test_in_jit_all_to_all_routing_matches_single_device(mesh):
    """In-jit all_to_all routing experiment (parallel.a2a): source-sharded
    batch, device-computed corner ownership (bit-identical uint32 hash),
    MoE-style dispatch + jax.lax.all_to_all, destination-side foreign-corner
    masking.  Must be exact vs the single-chip mapper with zero routing
    drops (host-sized capacity)."""
    import jax.numpy as jnp
    from ohm_tpu.parallel.a2a import make_source_batch, sharded_integrate_a2a
    from ohm_tpu.parallel.mapper import ResidentShardedArena

    rays = _scene(192, seed=23)
    m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    ref_vals = _reference_voxels(rays)

    from ohm_tpu.mapping.batch import prepare_ray_batch
    from ohm_tpu.mapping.tpu_map import TpuRayMapper

    mapper = TpuRayMapper(OccupancyMap(resolution=0.25, flags=MapFlag.NONE),
                          capacity=16)
    prepared = prepare_ray_batch(m, rays, segment_length=mapper.segment_length)

    arena = ResidentShardedArena(mesh, capacity=16,
                                 region_shift=mapper.region_shift,
                                 layer_names=["occupancy"],
                                 scatter_pad=1 << 16)
    arena.ensure_regions(prepared.region_keys)
    batch, max_pairs = make_source_batch(prepared, arena, mesh)
    cap = max(64, 1 << (max_pairs - 1).bit_length())

    import dataclasses
    cfg = dataclasses.replace(mapper._config(0), capacity=16,
                              scatter_pad=1 << 16)
    step = sharded_integrate_a2a(mesh, cfg, capacity=cap,
                                 region_dim_shift=mapper.region_shift)
    state = {"occupancy": arena.state["occupancy"]}
    new_state, stats = step(state, batch)
    assert int(np.asarray(stats["routing_dropped"]).sum()) == 0
    # Coverage: every record applied exactly once across shards.
    applied = int(np.asarray(stats["applied_updates"]).sum())
    assert applied > 0

    occ = np.asarray(new_state["occupancy"])
    occ = np.where((occ == 0) & np.signbit(occ), np.inf, occ)
    vals = {}
    for s, d in enumerate(arena.shards):
        V = arena.voxels_per_region
        for key, slot in d.slot_of.items():
            block = occ[s, slot * V:(slot + 1) * V]
            for i in np.flatnonzero(np.isfinite(block)):
                vals[(key, int(i))] = float(block[i])
    assert set(vals) == set(ref_vals)
    worst = max(abs(vals[k] - ref_vals[k]) for k in ref_vals)
    assert worst < 1e-5, worst
