"""Spatially sharded region arena over a jax.sharding.Mesh.

Design (SURVEY.md section 5.7-5.8, the "ICI backend" item): the region set is
partitioned across devices by region-key ownership (hash(region) mod
n_devices).  Each device keeps an independent arena + region table holding
only the regions it owns.  A ray batch is replicated to every device; each
device runs the full expand -> sort -> reduce -> scatter pipeline
(ops.integrate) against its local table, so contributions to regions it does
not own resolve to the sentinel and drop out.  Correctness is exact: each
voxel record is applied on exactly one device.

This trades redundant DDA compute (every chip walks every ray) for zero
hot-path collectives — the right trade while the walk is tiny next to the
sort, and rays arrive over DCN/host anyway.  A future all_to_all routing by
sample region key can shard the walk itself (reference has nothing
comparable; it is single-GPU).

Host side, the same VoxelArena/HostRegionTable machinery is reused with one
table per shard (mapping.arena); this module provides the device-side
shard_map wrapper the driver's dryrun exercises.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ohm_tpu.ops.integrate import IntegrateConfig, integrate_occupancy


def region_owner(region_keys: np.ndarray, n_shards: int, super_shift: int = 2) -> np.ndarray:
    """Shard ownership by SUPER-REGION hash (host-side, numpy).

    Regions are grouped into super-regions of 2^super_shift per axis before
    hashing, so a segment's 2x2x2 corner-region box usually lands on one
    owner: with 4-region super-blocks ~42% of segments have a single owner
    and the mean owner count is ~1.6 (vs 8 for per-region hashing at 8
    shards).  Hashing the super-region key (rather than tiling shards in
    space) keeps load statistically balanced across many frames.

    Arithmetic is uint32 wraparound so the DEVICE can reproduce ownership
    bit-exactly in int32 (parallel.a2a in-jit routing) — no i64 needed.
    """
    r = (np.asarray(region_keys, dtype=np.int64) >> super_shift).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = ((r[..., 0] * np.uint32(73856093))
             ^ (r[..., 1] * np.uint32(19349669))
             ^ (r[..., 2] * np.uint32(83492791)))
    return (h % np.uint32(n_shards)).astype(np.int64)


def region_owner_jnp(region_keys, n_shards: int, super_shift: int = 2):
    """Device-side twin of region_owner (bit-identical uint32 hash)."""
    import jax.numpy as jnp

    r = (region_keys.astype(jnp.int32) >> super_shift).astype(jnp.uint32)
    h = ((r[..., 0] * jnp.uint32(73856093))
         ^ (r[..., 1] * jnp.uint32(19349669))
         ^ (r[..., 2] * jnp.uint32(83492791)))
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


class ShardedArena:
    """Per-device arenas stacked on a leading shard axis.

    arrays: dict name -> [n_shards, ...] jnp arrays, sharded along axis 0.
    """

    def __init__(self, n_shards: int, capacity: int, region_shift: int, layer_names, mesh: Mesh):
        from ohm_tpu.mapping.arena import VoxelArena

        self.n_shards = n_shards
        self.mesh = mesh
        # Zero-encoded occupancy to match TpuRayMapper._config
        # (zero_unobserved=True) — the dryrun builds its cfg from a mapper.
        self.shards = [VoxelArena(capacity, region_shift, layer_names,
                                  occupancy_encoding="zero") for _ in range(n_shards)]
        self.capacity = capacity
        self.region_shift = region_shift

    def ensure_regions(self, region_keys: np.ndarray, host_map=None):
        owners = region_owner(region_keys, self.n_shards)
        for s, arena in enumerate(self.shards):
            mine = region_keys[owners == s]
            if len(mine):
                arena.ensure_regions(mine, host_map)

    def device_state(self) -> dict:
        """Stack per-shard arrays along a leading axis and shard over the mesh.

        Shard tables can differ in size after growth; pad to the largest.
        """
        states = [a.device_state() for a in self.shards]
        out = {}
        for key in states[0]:
            arrs = [np.asarray(s[key]) for s in states]
            out[key] = np.stack(arrs, axis=0)
        spec = jax.sharding.NamedSharding(self.mesh, P("shard"))
        return {k: jax.device_put(v, spec) for k, v in out.items()}

    def adopt(self, new_state: dict):
        """Scatter updated per-shard arrays back into the shard arenas."""
        for key in ("occupancy", "traversal", "mean_coord", "mean_count", "touch_time", "incident"):
            if key in new_state:
                host = np.asarray(new_state[key])
                for s, arena in enumerate(self.shards):
                    arena.arrays[key] = jnp.asarray(host[s])

    def sync_to_host(self, host_map, stamp=None):
        for arena in self.shards:
            arena.sync_to_host(host_map, stamp=stamp)


def sharded_integrate(mesh: Mesh, cfg: IntegrateConfig):
    """Build the jitted multi-chip integrate step: replicated batch, sharded arena."""

    def local_step(state, batch):
        # Inside shard_map: sharded leaves arrive as local blocks of size 1
        # on the shard axis — squeeze, integrate locally, restore.  The ray
        # geometry (floats/flags/touch) is replicated; 'ints' is per-shard
        # because its corner-slot columns index the local shard's arena.
        local = {k: v[0] for k, v in state.items()}
        local_batch = dict(batch)
        local_batch["ints"] = batch["ints"][0]
        new_local, stats = integrate_occupancy(local, local_batch, cfg)
        new_state = {k: v[None] for k, v in new_local.items()}
        stats = {k: stats[k][None] for k in _stats_keys()}
        return new_state, stats

    shard = P("shard")
    repl = P()
    batch_spec = {"ints": shard, "floats": repl, "flags": repl, "touch": repl}

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=({k: shard for k in _state_keys(cfg)}, batch_spec),
        out_specs=({k: shard for k in _state_keys(cfg)}, {k: shard for k in _stats_keys()}),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_routed_batch(prepared, sharded_arena, mesh: Mesh, with_intensity: bool = False):
    """Route segments to the shards owning their corner regions.

    The replicated scheme (make_sharded_batch) ships every segment to every
    chip; here a segment is sent only to the DISTINCT owners of its 2x2x2
    corner-region box, cutting per-chip DDA + sort work ~n-fold.  Every
    voxel record still reaches exactly one shard (its region's owner is by
    construction among the segment's corner owners), so the sharded
    write-once invariant of check_sharded_coverage is preserved.

    Returns (batch dict with all arrays stacked [n_shards, B_max, ...],
    per-shard active segment counts).
    """
    from ohm_tpu.mapping.batch import fill_corner_slots

    n_shards = sharded_arena.n_shards
    total = prepared.n_segments
    owners = region_owner(prepared.corner_regions[:total].reshape(-1, 3), n_shards)
    owners = owners.reshape(total, 8)

    # Per-shard segment index lists (a segment may appear on several shards).
    sel = [np.flatnonzero((owners == s).any(axis=1)) for s in range(n_shards)]
    counts = [len(ix) for ix in sel]
    b_max = _next_pow2(max(max(counts), 1))

    arrays = prepared.arrays
    ints = np.zeros((n_shards, b_max, arrays["ints"].shape[1]), arrays["ints"].dtype)
    ints[:, :, 9:17] = -1
    floats = np.zeros((n_shards, b_max, arrays["floats"].shape[1]), arrays["floats"].dtype)
    flags = np.zeros((n_shards, b_max, arrays["flags"].shape[1]), arrays["flags"].dtype)
    touch = np.zeros((n_shards, b_max), arrays["touch"].dtype)
    intensity = (np.zeros((n_shards, b_max), np.float32) if with_intensity else None)

    for sidx, ix in enumerate(sel):
        k = len(ix)
        # Resolve corner slots against THIS shard's region table: non-owned
        # corners resolve to -1 and their records drop on-device.
        sub = _subset_prepared(prepared, ix)
        fill_corner_slots(sub, sharded_arena.shards[sidx].table)
        ints[sidx, :k] = sub.arrays["ints"][:k]
        floats[sidx, :k] = sub.arrays["floats"][:k]
        flags[sidx, :k] = sub.arrays["flags"][:k]
        touch[sidx, :k] = sub.arrays["touch"][:k]
        if intensity is not None and prepared.intensities is not None:
            intensity[sidx, :k] = prepared.intensities[ix]

    shard_spec = jax.sharding.NamedSharding(mesh, P("shard"))
    batch = {
        "ints": jax.device_put(ints, shard_spec),
        "floats": jax.device_put(floats, shard_spec),
        "flags": jax.device_put(flags, shard_spec),
        "touch": jax.device_put(touch, shard_spec),
    }
    if intensity is not None:
        batch["intensity"] = jax.device_put(intensity, shard_spec)
    return batch, np.asarray(counts)


def _next_pow2(n: int) -> int:
    size = 256
    while size < n:
        size *= 2
    return size


def _subset_prepared(prepared, ix):
    """A PreparedBatch view holding only segments ``ix`` (host-side copy)."""
    import dataclasses as _dc

    arrays = {k: v[ix].copy() if v.ndim else v for k, v in prepared.arrays.items()}
    # keep fixed widths; sizes re-derived from ix
    return _dc.replace(prepared, size=len(ix), n_segments=len(ix),
                       arrays=arrays, corner_regions=prepared.corner_regions[ix])


def sharded_integrate_routed(mesh: Mesh, cfg: IntegrateConfig):
    """Jitted multi-chip integrate for ROUTED batches: every batch array is
    sharded on the leading shard axis (no replication)."""

    def local_step(state, batch):
        local = {k: v[0] for k, v in state.items()}
        local_batch = {k: v[0] for k, v in batch.items()}
        new_local, stats = integrate_occupancy(local, local_batch, cfg)
        return ({k: v[None] for k, v in new_local.items()},
                {k: stats[k][None] for k in _stats_keys()})

    shard = P("shard")
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=({k: shard for k in _state_keys(cfg)},
                  {k: shard for k in _batch_keys()}),
        out_specs=({k: shard for k in _state_keys(cfg)},
                   {k: shard for k in _stats_keys()}),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def check_routed_coverage(stats, total_records: int) -> None:
    """Routed invariant: every record applies on exactly one shard, so the
    per-shard applied counts must sum to the SINGLE-DEVICE active record
    count (which the caller computes from an unrouted reference run)."""
    applied = int(np.asarray(stats["applied_updates"]).sum())
    if applied != total_records:
        raise AssertionError(
            f"routed coverage broken: {applied} records applied across shards, "
            f"expected {total_records}")


def make_sharded_batch(prepared, sharded_arena, mesh: Mesh):
    """Stack per-shard corner-slot ints and replicate the rest of the batch."""
    from ohm_tpu.mapping.batch import fill_corner_slots

    ints_per_shard = []
    for arena in sharded_arena.shards:
        fill_corner_slots(prepared, arena.table)
        ints_per_shard.append(prepared.arrays["ints"].copy())
    ints = np.stack(ints_per_shard, axis=0)

    shard_spec = jax.sharding.NamedSharding(mesh, P("shard"))
    repl_spec = jax.sharding.NamedSharding(mesh, P())
    return {
        "ints": jax.device_put(ints, shard_spec),
        "floats": jax.device_put(prepared.arrays["floats"], repl_spec),
        "flags": jax.device_put(prepared.arrays["flags"], repl_spec),
        "touch": jax.device_put(prepared.arrays["touch"], repl_spec),
    }


def _state_keys(cfg: IntegrateConfig):
    keys = ["occupancy"]
    if cfg.with_traversal:
        keys.append("traversal")
    if cfg.with_mean:
        keys += ["mean_coord", "mean_count"]
    if cfg.with_touch_time:
        keys.append("touch_time")
    if cfg.with_incident:
        keys.append("incident")
    return keys


def _batch_keys():
    return ["ints", "floats", "flags", "touch"]


def _stats_keys():
    return ["missed_updates", "applied_updates", "overflow", "touched"]


def check_sharded_coverage(stats) -> None:
    """Validate the multichip write-once invariant.

    Single-device 'missed_updates == 0' is meaningless here: records touching
    regions owned by other shards intentionally resolve to the sentinel and
    count as missed on every non-owner.  The sharded invariant is instead
    that each active record is applied on exactly ONE shard:
    sum_over_shards(applied) == active, where active = applied + missed on
    any single shard (ray geometry is replicated, so active counts are
    shard-invariant).
    """
    applied = np.asarray(stats["applied_updates"]).reshape(-1)
    missed = np.asarray(stats["missed_updates"]).reshape(-1)
    active = int(applied[0] + missed[0])
    total_applied = int(applied.sum())
    if total_applied != active:
        raise AssertionError(
            f"sharded coverage broken: {total_applied} records applied across "
            f"shards but {active} active (each record must apply exactly once)")
