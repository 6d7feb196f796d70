"""Multi-chip mapping on the PRODUCTION rayflow pipeline (VERDICT r3 item 5).

Round 3 left two pipelines: the single-chip perf stack (rayflow per-ray wire,
dictionary candidates, fused apply) and the multi-chip correctness stack
(segmented wire + host re-packing).  This module unifies them:

  - Host: rays are split round-robin by SOURCE shard; each sub-batch is
    prepared with the normal rayflow C++ pass (mapping.batch.prepare_rayflow)
    against a COMMON union bbox, and its candidate dictionary is resolved
    against each region's OWNER shard table (dict entries pack the owner's
    slot; the wire layout is byte-identical to single-chip).  One stacked
    device_put ships all shards' wires (the multi-chip form of the coalesced
    transfer).
  - Device (one shard_map step): each source shard unpacks its wire, derives
    every ray's DISTINCT candidate-region owners bit-identically to the host
    hash (parallel.sharded.region_owner_jnp), routes the unpacked field
    arrays with the MoE dispatch pattern (3 jax.lax.all_to_all calls: ints /
    floats / flags), masks foreign candidates on the destination (their dict
    slots never resolve), and runs the UNCHANGED single-chip core
    (ops.integrate / integrate_ndt / integrate_tsdf) against its resident
    arena shard.

Write-once invariant: every region has exactly one owner, each ray reaches
every owner of its candidate set exactly once, and foreign candidates are
masked — so each voxel record deposits on exactly one shard.  Exactness is
pinned against the single-chip mapper in tests/test_sharded_rayflow.py.

The reference is single-GPU (SURVEY.md section 5.8); this is the ICI scale-out
design, not a port.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ohm_tpu.core.rayflags import normalize_reverse_walk
from ohm_tpu.mapping.batch import prepare_rayflow, rayflow_wire, frac_dict_of
from ohm_tpu.ops.integrate import IntegrateConfig, integrate_occupancy
from ohm_tpu.parallel.mapper import ResidentShardedArena
from ohm_tpu.parallel.sharded import region_owner, region_owner_jnp


def _pow2(n: int, floor: int = 64) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _decode_rel(tcand):
    """Packed candidate -> bbox-relative region coords [..., 3]."""
    return jnp.stack([tcand & 63, (tcand >> 6) & 63, (tcand >> 12) & 63],
                     axis=-1)


def build_rayflow_step(mesh: Mesh, cfg, core_fn, state_keys, stats_keys,
                       capacity: int, n_shards: int):
    """One jitted shard_map step: unpack -> in-jit owner routing ->
    all_to_all -> foreign-candidate masking -> single-chip core."""
    from ohm_tpu.ops import blocked
    from ohm_tpu.ops.integrate import _unpack_batch

    base = cfg if isinstance(cfg, IntegrateConfig) else cfg.base
    K = base.table_k

    def local_step(state, wires):
        local = {k: v[0] for k, v in state.items()}
        b = _unpack_batch({"rayw": wires[0]}, base)
        R = b["length"].shape[0]
        gmeta = b["gmeta"]

        # Distinct candidate-region owners per ray (device twin of the host
        # hash; null dict entries carry slot bits 0 and never route).
        absr = _decode_rel(b["tcand"]) + gmeta[0:3][None, None, :]
        owner = region_owner_jnp(absr, n_shards)            # [R, K]
        live = ((b["tcand"] >> 18) > 0) & b["valid"][:, None]
        dest = jnp.where(live, owner, jnp.int32(n_shards))
        dest = jax.lax.sort(dest, dimension=1)
        firsts = jnp.concatenate(
            [jnp.ones((R, 1), bool), dest[:, 1:] != dest[:, :-1]], axis=1)
        dest_flat = jnp.where(firsts, dest, jnp.int32(n_shards)).reshape(-1)
        ray = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0), (R, K)).reshape(-1)

        dest_s, ray_s = jax.lax.sort((dest_flat, ray), num_keys=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (R * K, 1), 0).squeeze(-1)
        first = jnp.concatenate([jnp.array([True]), dest_s[1:] != dest_s[:-1]])
        basepos = blocked.cummax(jnp.where(first, pos, -(1 << 30)),
                                 lowest=-(1 << 30))
        slot_in = pos - basepos
        ok = (dest_s < n_shards) & (slot_in < capacity)
        dropped = jnp.sum((dest_s < n_shards) & ~ok).astype(jnp.int32)
        send_slot = jnp.where(ok, dest_s * capacity + slot_in,
                              n_shards * capacity)

        # Field arrays, packed into three transport planes.
        ints = jnp.concatenate([
            b["start_abs"], b["end_abs"], b["tcand"],
            b["ray_order"][:, None],
            jax.lax.bitcast_convert_type(b["touch_enc"], jnp.int32)[:, None],
        ], axis=1)
        floats = jnp.concatenate([
            b["start_frac"], b["direction"], b["length"][:, None],
            b["intensity"][:, None],
        ], axis=1)
        flags = jnp.stack([b["is_sample"], b["end_as_miss"], b["valid"]],
                          axis=1)

        def build(arr, fill):
            rows = arr[ray_s]
            buf = jnp.full((n_shards * capacity + 1,) + arr.shape[1:],
                           fill, arr.dtype)
            buf = buf.at[send_slot].set(jnp.where(
                ok.reshape((-1,) + (1,) * (arr.ndim - 1)), rows,
                jnp.full_like(rows, fill)))
            return buf[:-1].reshape(n_shards, capacity, *arr.shape[1:])

        r_ints = jax.lax.all_to_all(build(ints, -1), "shard", 0, 0
                                    ).reshape(n_shards * capacity, -1)
        r_floats = jax.lax.all_to_all(build(floats, 0.0), "shard", 0, 0
                                      ).reshape(n_shards * capacity, -1)
        r_flags = jax.lax.all_to_all(build(flags, False), "shard", 0, 0
                                     ).reshape(n_shards * capacity, -1)

        me = jax.lax.axis_index("shard").astype(jnp.int32)
        tcand_r = r_ints[:, 6:6 + K]
        absr_r = _decode_rel(tcand_r) + gmeta[0:3][None, None, :]
        owner_r = region_owner_jnp(absr_r, n_shards)
        tcand_r = jnp.where(owner_r == me, tcand_r, jnp.int32(0))

        valid = r_flags[:, 2]
        start_abs = r_ints[:, 0:3]
        end_abs = r_ints[:, 3:6]
        start_frac = r_floats[:, 0:3]
        direction = r_floats[:, 3:6]
        length = r_floats[:, 6]
        res = jnp.float32(base.resolution)
        rb = {
            "start_abs": start_abs,
            "end_abs": end_abs,
            "start_frac": start_frac,
            "direction": direction,
            "length": length,
            # Bit-identical recomputation of the unpack-side derivation.
            "end_frac": (start_frac
                         + (start_abs - end_abs).astype(jnp.float32) * res
                         + length[:, None] * direction),
            "is_sample": r_flags[:, 0] & valid,
            "end_as_miss": r_flags[:, 1] & valid,
            "exclude_start": valid,
            "valid": valid,
            "touch_enc": jax.lax.bitcast_convert_type(
                r_ints[:, 6 + K + 1], jnp.uint32),
            "intensity": r_floats[:, 7],
            "t0": jnp.zeros_like(length),
            "full_length": length,
            "tcand": tcand_r,
            "gmeta": gmeta,
            "ray_order": r_ints[:, 6 + K],
        }
        new_local, stats = core_fn(local, rb, cfg)
        stats = dict(stats)
        stats["routing_dropped"] = dropped
        return ({k: new_local[k][None] for k in state_keys},
                {k: stats[k][None] for k in stats_keys})

    shard = P("shard")
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=({k: shard for k in state_keys}, shard),
        out_specs=({k: shard for k in state_keys},
                   {k: shard for k in stats_keys}),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


class ShardedRayFlowMapper:
    """Region-sharded multi-chip mapper on the production rayflow wire.

    Same arena/kind machinery as parallel.mapper.ShardedRayMapper, but the
    per-batch pipeline is the single-chip one: rayflow C++ prep, dictionary
    candidate wire, one stacked transfer, in-jit all_to_all routing, and the
    unchanged integrate cores per shard.
    """

    OCC_STATS = ("missed_updates", "applied_updates", "overflow", "touched",
                 "routing_dropped")
    AUX_STATS = ("missed_updates", "overflow", "touched", "routing_dropped")

    def __init__(self, map_obj, mesh: Mesh, kind: str = "occupancy",
                 capacity: int = 256, scatter_pad: int = 1 << 20,
                 validate: bool = False, ndt_params=None, tsdf_options=None):
        # Reuse ShardedRayMapper's layer/kind/arena setup wholesale.
        from ohm_tpu.parallel.mapper import ShardedRayMapper

        self._seg = ShardedRayMapper(
            map_obj, mesh, kind=kind, capacity=capacity,
            scatter_pad=scatter_pad, validate=False,
            ndt_params=ndt_params, tsdf_options=tsdf_options)
        self.map = map_obj
        self.mesh = mesh
        self.kind = kind
        self.validate = validate
        self.arena = self._seg.arena
        self.n_shards = self.arena.n_shards
        self._steps: dict = {}
        self._stats = {"rays": 0, "batches": 0, "missed_updates": 0,
                       "overflow": 0, "routing_dropped": 0,
                       "routed_rays": 0, "wire_bytes": 0}
        #: Per-shard applied_updates of the most recent drained batch — the
        #: record-balance signal (VERDICT r4 item 6: the scale-out stack
        #: needs a cost story, not just exactness).
        self.last_balance = None
        self._pending = []
        self._spec = NamedSharding(mesh, P("shard"))
        # Monotone compile-shape caches (single-chip analogues).
        self._k_cache = 4
        self._steps_cache = 32
        self._wcap_cache = 64
        self._cap_cache = 64

    # ------------------------------------------------------------------ #

    def _owner_slots(self, region_keys: np.ndarray) -> np.ndarray:
        """Resolve every region's slot in its OWNER shard's table."""
        from ohm_tpu import native

        n = len(region_keys)
        owners = region_owner(region_keys, self.n_shards)
        slots = np.full(n, -1, np.int32)
        for s in range(self.n_shards):
            mine = owners == s
            if not mine.any():
                continue
            slots[mine] = native.lookup_slots(
                region_keys[mine], self.arena.shards[s].table)
        if (slots < 0).any():
            raise RuntimeError("owner table missing a just-ensured region")
        return slots

    def integrate_rays(self, rays, intensities=None, timestamps=None,
                       ray_update_flags: int = 0) -> int:
        ray_update_flags = normalize_reverse_walk(ray_update_flags)
        m = self.map
        m.touch()
        r = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n_rays = r.shape[0] // 2
        S = self.n_shards

        # Source split (round-robin).  In production each chip ingests its
        # own lidar stream; round-robin is the dryrun stand-in.
        pairs = r.reshape(n_rays, 2, 3)
        subs, sub_int = [], []
        for s in range(S):
            subs.append(pairs[s::S].reshape(-1, 3))
            if intensities is not None:
                sub_int.append(np.asarray(intensities, np.float32
                                          ).reshape(-1)[s::S])
            else:
                sub_int.append(None)

        rfs = [prepare_rayflow(m, subs[s], intensities=sub_int[s],
                               ray_update_flags=ray_update_flags)
               for s in range(S)]
        if any(rf is None for rf in rfs):
            raise ValueError("batch outside the rayflow envelope; use "
                             "parallel.mapper.ShardedRayMapper for the "
                             "segmented fallback")
        rpad = rfs[0].rpad
        if any(rf.rpad != rpad for rf in rfs):
            raise ValueError("uneven source split (rpad mismatch); pass a "
                             "batch with >= 256*n_shards rays")

        # Common union bbox (all wires encode rel coords against it).
        bbox = rfs[0].bbox.copy()
        for rf in rfs[1:]:
            bbox[0:3] = np.minimum(bbox[0:3], rf.bbox[0:3])
            bbox[3:6] = np.maximum(bbox[3:6], rf.bbox[3:6])
        if np.any(bbox[3:6] - bbox[0:3] > 63):
            raise ValueError("union bbox exceeds the 6-bit rel-region bound")

        all_regions = np.unique(np.concatenate(
            [rf.region_keys for rf in rfs]), axis=0).astype(np.int32)
        self.arena.ensure_regions(all_regions, host_map=m)

        # Shared compile-shape caps (monotone, as single-chip).
        table_k = max(rf.table_k for rf in rfs)
        self._k_cache = max(self._k_cache, table_k)
        steps = max(int(rf.max_axis_steps) for rf in rfs) + 1
        self._steps_cache = max(self._steps_cache, -(-steps // 32) * 32)
        wcap = max(int(rf.crossings.max()) if rf.n_rays else 1
                   for rf in rfs) + 2
        self._wcap_cache = max(self._wcap_cache, -(-wcap // 64) * 64)

        # Per-source wires against the union bbox, dicts resolved per OWNER.
        # The dict mode and fdict mode must agree across shards (one wire
        # shape, one compiled program).
        import dataclasses as _dc

        nreg_max = max(len(rf.region_keys) for rf in rfs)
        cdict = 1 if nreg_max <= 255 else (2 if nreg_max <= 2047 else 0)
        if cdict == 0:
            raise ValueError("sharded rayflow requires the dictionary wire "
                             "(<= 2047 regions per source sub-batch)")
        fds = [frac_dict_of(rf) for rf in rfs]
        fdict_on = all(fd is not None for fd in fds)
        wires = []
        for s, rf in enumerate(rfs):
            rf.bufs["bbox"][:] = bbox
            rf = _dc.replace(rf, table_k=self._k_cache)
            w = rayflow_wire(rf, self.arena.shards[0].table,
                             with_touch=False,
                             with_intensity=self.kind == "ndt",
                             cdict=cdict, fdict=fds[s] if fdict_on else None)
            # Overwrite the dict block with owner-resolved candidates.
            keys = rf.region_keys
            slots = self._owner_slots(keys)
            rel = keys.astype(np.int64) - bbox[0:3][None, :]
            packed = (((slots.astype(np.int64) + 1) << 18)
                      | rel[:, 0] | (rel[:, 1] << 6) | (rel[:, 2] << 12)
                      ).astype(np.int32)
            n_entries, idx_w = (256, 1) if cdict == 1 else (2048, 2)
            dict_bytes = 4 * n_entries
            tail = dict_bytes + idx_w * rpad * self._k_cache
            dict_block = np.zeros(n_entries, np.int32)
            dict_block[:len(packed)] = packed
            w[-tail:-tail + dict_bytes] = dict_block.view(np.uint8)
            wires.append(w)

        stacked = jax.device_put(np.stack(wires), self._spec)

        # Per-(source, dest) ray capacity from the host's exact owner sets;
        # the same pass counts total routed ray copies (a ray ships to each
        # distinct owner of its candidate regions — the replication factor).
        cap = 0
        routed_total = 0
        for s, rf in enumerate(rfs):
            rt = rf.bufs["ray_table"][:rf.n_rays]
            counts = rf.bufs["ray_count"][:rf.n_rays]
            owners = region_owner(rt.reshape(-1, 3), self.n_shards
                                  ).reshape(rf.n_rays, -1)
            kidx = np.arange(rt.shape[1])[None, :]
            owners = np.where(kidx < counts[:, None], owners, -1)
            for d in range(self.n_shards):
                n_d = int(np.any(owners == d, axis=1).sum())
                cap = max(cap, n_d)
                routed_total += n_d
        self._cap_cache = max(self._cap_cache, _pow2(cap))
        self._stats["routed_rays"] += routed_total
        self._stats["wire_bytes"] += sum(int(w.nbytes) for w in wires)

        cfg, core, stats_keys = self._config_and_core(ray_update_flags,
                                                      cdict, fdict_on)
        cache_key = (cfg, stacked.shape, self._cap_cache)
        step = self._steps.get(cache_key)
        if step is None:
            step = build_rayflow_step(
                self.mesh, cfg, core, tuple(self.arena.layer_names),
                stats_keys, self._cap_cache, self.n_shards)
            self._steps[cache_key] = step
        state = {k: self.arena.state[k] for k in self.arena.layer_names}
        new_state, stats = step(state, stacked)
        self.arena.state.update(new_state)

        self._stats["rays"] += n_rays
        self._stats["batches"] += 1
        self._pending.append(stats)
        if self.validate:
            self._drain()
            assert self._stats["routing_dropped"] == 0
            assert self._stats["overflow"] == 0
        return n_rays

    def _config_and_core(self, ray_flags: int, cdict: int, fdict: bool):
        import dataclasses as _dc

        seg = self._seg
        base = seg._base_config(ray_flags)
        base = _dc.replace(
            base,
            max_steps=self._steps_cache,
            walk_cap=self._wcap_cache,
            table_k=self._k_cache,
            rayw_cdict=cdict,
            rayw_fdict=fdict,
            rayw_intensity=self.kind == "ndt",
            with_touch_time=False,
        )
        if self.kind == "occupancy":
            return base, integrate_occupancy, self.OCC_STATS
        cfg, core, _ = seg._config_and_core(ray_flags)
        cfg = _dc.replace(cfg, base=base)
        return cfg, core, self.AUX_STATS

    def _drain(self):
        for stats in self._pending:
            self._stats["missed_updates"] += int(
                np.asarray(stats["missed_updates"]).sum())
            self._stats["overflow"] += int(np.asarray(stats["overflow"]).sum())
            self._stats["routing_dropped"] += int(
                np.asarray(stats["routing_dropped"]).sum())
            if "applied_updates" in stats:
                self.last_balance = np.asarray(
                    stats["applied_updates"]).reshape(-1).tolist()
        self._pending.clear()

    def sync_voxels(self):
        jax.block_until_ready(self.arena.state["occupancy"])
        self._drain()
        self.arena.sync_to_host(self.map, stamp=self.map.stamp)

    @property
    def stats(self) -> dict:
        self._drain()
        return dict(self._stats)
