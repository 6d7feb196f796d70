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
