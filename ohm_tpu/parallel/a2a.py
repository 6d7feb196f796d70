"""In-jit all_to_all ray routing over ICI (experiment; SURVEY section 5.8).

Host routing (parallel.sharded.make_routed_batch) re-packs per-shard ray
subsets in a Python loop — fine through a host bottleneck, but on a real
multi-chip pod the batch would already be sharded by SOURCE (each chip
ingests its own lidar stream) and routing belongs on the interconnect.
This module routes ON DEVICE with the MoE-dispatch pattern:

  1. each source shard computes, per segment, the DISTINCT owners of its
     2x2x2 corner-region box (region_owner_jnp — bit-identical to the host
     hash) — a (segment, owner) pair list with duplicates masked;
  2. pairs are sorted by destination; per-destination positions come from
     the position-diff trick; segments scatter into a [n_dest, cap, ...]
     send buffer;
  3. one jax.lax.all_to_all per batch array swaps send buffers over the
     "shard" mesh axis; the receive side concatenates its [n_src, cap]
     slots into a local batch.

Corner slots are pre-resolved on the HOST against each corner's OWNER
table (make_source_batch), and every destination masks foreign corners
on device (owner(corner_region) != my shard -> slot -1), preserving the
write-once invariant without any device-resident region table.

The fixed per-(source, dest) capacity is the standard MoE trade: overflow
pairs are dropped and counted (stats['routing_dropped'] must be zero for a
correct run — capacity is sized from the host's exact counts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ohm_tpu.ops.integrate import IntegrateConfig, integrate_occupancy
from ohm_tpu.parallel.sharded import region_owner, region_owner_jnp


#: Corner offsets in cidx order (dx + 2*dy + 4*dz) — must match
#: mapping.batch corner packing and ops.integrate._resolve_slots.
_OFFS = np.array([[dx, dy, dz] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
                 dtype=np.int32)


def make_source_batch(prepared, arenas, mesh: Mesh):
    """Shard a prepared batch by SOURCE (round-robin) with corner slots
    pre-resolved against each corner's OWNER shard table.

    Returns (batch dict of [n_shards, B_loc, ...] arrays sharded on axis 0,
    per-(source,dest) max pair count for capacity sizing).
    """
    from ohm_tpu.mapping.batch import fill_corner_slots
    import dataclasses as _dc

    n_shards = len(arenas.shards) if hasattr(arenas, "shards") else len(arenas)
    shards = arenas.shards if hasattr(arenas, "shards") else arenas
    total = prepared.n_segments

    # Resolve every corner against its owner's table: query each shard's
    # table for all corners, then select by ownership.
    corner_regions = prepared.corner_regions[:total]  # [B, 8, 3]
    owners = region_owner(corner_regions.reshape(-1, 3), n_shards).reshape(total, 8)
    slots = np.full((total, 8), -1, np.int32)
    for s in range(n_shards):
        sub = _dc.replace(prepared, size=total, n_segments=total,
                          arrays={k: v[:total].copy() for k, v in prepared.arrays.items()},
                          corner_regions=corner_regions)
        fill_corner_slots(sub, shards[s].table)
        mine = owners == s
        slots[mine] = sub.arrays["ints"][:total, 9:17][mine]

    arrays = {k: v[:total] for k, v in prepared.arrays.items()}
    ints = arrays["ints"].copy()
    ints[:, 9:17] = slots

    b_loc = -(-total // n_shards)
    b_loc = max(256, 1 << (b_loc - 1).bit_length())

    def shard_arr(a, fill=0):
        out = np.full((n_shards, b_loc) + a.shape[1:], fill, a.dtype)
        for s in range(n_shards):
            part = a[s::n_shards]
            out[s, :len(part)] = part
        return out

    spec = NamedSharding(mesh, P("shard"))
    batch = {
        "ints": jax.device_put(shard_arr(ints), spec),
        "floats": jax.device_put(shard_arr(arrays["floats"].astype(np.float32)), spec),
        "flags": jax.device_put(shard_arr(arrays["flags"].astype(bool)), spec),
        "touch": jax.device_put(shard_arr(arrays["touch"]), spec),
    }
    # Exact per-(source, dest) distinct-owner pair counts for capacity.
    max_pairs = 0
    for s in range(n_shards):
        sub_owners = owners[s::n_shards]
        for d in range(n_shards):
            cnt = int(np.any(sub_owners == d, axis=1).sum())
            max_pairs = max(max_pairs, cnt)
    return batch, max_pairs


def sharded_integrate_a2a(mesh: Mesh, cfg: IntegrateConfig, capacity: int,
                          region_dim_shift: int):
    """Jitted step: in-jit corner-owner routing + all_to_all + local
    integrate.  ``capacity`` is the per-(source, dest) segment budget."""
    n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    offs = jnp.asarray(_OFFS)

    def local_step(state, batch):
        local = {k: v[0] for k, v in state.items()}
        ints = batch["ints"][0]          # [B, 17]
        floats = batch["floats"][0]
        flags = batch["flags"][0]
        touch = batch["touch"][0]
        B = ints.shape[0]

        # Distinct corner owners per segment (device twin of the host hash).
        start_r = ints[:, 0:3] >> region_dim_shift
        end_r = ints[:, 3:6] >> region_dim_shift
        rmin = jnp.minimum(start_r, end_r)
        span = jnp.minimum(jnp.maximum(start_r, end_r) - rmin, 1)
        corners = rmin[:, None, :] + offs[None, :, :] * span[:, None, :]
        owner8 = region_owner_jnp(corners, n_shards)  # [B, 8]
        # First-occurrence mask: pair (segment, owner) appears once.
        firsts = jnp.ones((B, 8), bool)
        for c in range(1, 8):
            dup = jnp.zeros((B,), bool)
            for p in range(c):
                dup = dup | (owner8[:, p] == owner8[:, c])
            firsts = firsts.at[:, c].set(~dup)
        valid_seg = flags[:, 3]
        pair_valid = firsts & valid_seg[:, None]

        # Sort pairs by destination; in-dest positions by position diff.
        dest = jnp.where(pair_valid, owner8, jnp.int32(n_shards)).reshape(-1)
        seg = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0), (B, 8)).reshape(-1)
        dest_s, seg_s = jax.lax.sort((dest, seg), num_keys=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (B * 8, 1), 0).squeeze(-1)
        first = jnp.concatenate([jnp.array([True]), dest_s[1:] != dest_s[:-1]])
        from ohm_tpu.ops import blocked
        base = blocked.cummax(jnp.where(first, pos, -(1 << 30)), lowest=-(1 << 30))
        slot_in_dest = pos - base
        ok = (dest_s < n_shards) & (slot_in_dest < capacity)
        dropped = jnp.sum((dest_s < n_shards) & ~ok)
        send_slot = jnp.where(ok, dest_s * capacity + slot_in_dest,
                              n_shards * capacity)  # overflow -> scratch row

        def build(arr, fill):
            rows = arr[seg_s]
            buf = jnp.full((n_shards * capacity + 1,) + arr.shape[1:], fill, arr.dtype)
            buf = buf.at[send_slot].set(jnp.where(
                ok.reshape((-1,) + (1,) * (arr.ndim - 1)), rows,
                jnp.full_like(rows, fill)))
            return buf[:-1].reshape(n_shards, capacity, *arr.shape[1:])

        send_ints = build(ints, -1)
        send_floats = build(floats, 0.0)
        send_flags = build(flags, False)
        send_touch = build(touch, 0)

        # Swap over ICI: [n_dest, cap, ...] -> receive [n_src, cap, ...].
        recv_ints = jax.lax.all_to_all(send_ints, "shard", 0, 0, tiled=False)
        recv_floats = jax.lax.all_to_all(send_floats, "shard", 0, 0, tiled=False)
        recv_flags = jax.lax.all_to_all(send_flags, "shard", 0, 0, tiled=False)
        recv_touch = jax.lax.all_to_all(send_touch, "shard", 0, 0, tiled=False)

        r_ints = recv_ints.reshape(n_shards * capacity, -1)
        r_floats = recv_floats.reshape(n_shards * capacity, -1)
        r_flags = recv_flags.reshape(n_shards * capacity, -1)
        r_touch = recv_touch.reshape(n_shards * capacity)

        # Mask foreign corner slots: only corners THIS shard owns resolve.
        me = jax.lax.axis_index("shard").astype(jnp.int32)
        rs = jnp.minimum(r_ints[:, 0:3] >> region_dim_shift,
                         r_ints[:, 3:6] >> region_dim_shift)
        rspan = jnp.minimum(jnp.maximum(r_ints[:, 0:3] >> region_dim_shift,
                                        r_ints[:, 3:6] >> region_dim_shift) - rs, 1)
        rcorners = rs[:, None, :] + offs[None, :, :] * rspan[:, None, :]
        rowner = region_owner_jnp(rcorners, n_shards)
        slots8 = jnp.where(rowner == me, r_ints[:, 9:17], jnp.int32(-1))
        r_ints = jnp.concatenate([r_ints[:, 0:9], slots8], axis=1)
        # Received padding rows carry flags == False, so flags[:, 3]
        # (the valid bit) already invalidates them.

        local_batch = {"ints": r_ints, "floats": r_floats,
                       "flags": r_flags, "touch": r_touch}
        new_local, stats = integrate_occupancy(local, local_batch, cfg)
        stats = dict(stats)
        stats["routing_dropped"] = dropped.astype(jnp.int32)
        keys = ("missed_updates", "applied_updates", "overflow", "touched",
                "routing_dropped")
        return ({k: v[None] for k, v in new_local.items()},
                {k: stats[k][None] for k in keys})

    shard = P("shard")
    state_keys = ["occupancy"]
    if cfg.with_traversal:
        state_keys.append("traversal")
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=({k: shard for k in state_keys},
                  {k: shard for k in ("ints", "floats", "flags", "touch")}),
        out_specs=({k: shard for k in state_keys},
                   {k: shard for k in ("missed_updates", "applied_updates",
                                       "overflow", "touched", "routing_dropped")}),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))
