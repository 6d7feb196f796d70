"""Fused NDT-OM / NDT-TM ray-batch integration.

TPU-native replacement for the reference's two-phase GPU NDT
(ohmgpu/GpuNdtMap.cpp:150-489): phase 1 `regionRayUpdateNdt` (per-ray miss
walk with CAS) and phase 2 `covarianceHitNdt` (leader-elected sequential
Gram-Schmidt over samples sorted by voxel).  Here:

- The miss phase computes per-(ray, voxel) NDT log-odds deltas.  Only voxels
  holding a usable Gaussian (sample count >= threshold) need the expensive
  likelihood math, and they are a small minority of visited voxels, so the
  pipeline *compacts*: records are flagged via one count gather, sorted by
  flag, and only the first `miss_k` records run the likelihood math and the
  per-voxel state gathers (a ~10x reduction in latency-bound random gathers).
  Overflowing records degrade gracefully to standard occupancy misses (the
  same math the reference applies below the sample threshold) and are counted
  in stats.
- The hit phase replaces the sequential per-sample recursion with the
  closed-form batch merge (ops.ndt.merge_covariance_batch) — exact in exact
  arithmetic — plus per-sample NDT-TM consistency checks evaluated against
  batch-start state.
- Occupancy applies via the same packed-count scatter + dense sweep as the
  occupancy pipeline, extended with the NDT miss delta plane.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ohm_tpu.core.rayflags import RayFlag
from ohm_tpu.ops import ndt as ndtops
from ohm_tpu.ops import subvoxel_jnp
from ohm_tpu.ops.ddawalk import walk_rays
from ohm_tpu.ops.integrate import (
    IntegrateConfig,
    _resolve_slots,
    _segment_reduce,
    _unique_scatter_indices,
    _unpack_batch,
    _unobserved,
    sorted_hit_miss_counts,
    sorted_nonneg_sums,
)


@dataclasses.dataclass(frozen=True)
class NdtConfig:
    """Static NDT parameters layered over the base integrate config."""

    base: IntegrateConfig
    sensor_noise: float = 0.05
    sample_threshold: int = 3
    adaptation_rate: float = 0.4
    reinit_threshold: float = -1.3862944  # probabilityToValue(0.2)
    reinit_count: int = 100
    initial_intensity_covariance: float = 1.0
    ndt_tm: bool = False
    #: Compaction budget for Gaussian-bearing miss records per batch.
    miss_k: int = 1 << 16


def integrate_ndt(arena: dict, batch: dict, cfg: NdtConfig):
    """Integrate one packed ray batch with NDT-OM (+TM) semantics.

    arena layers: occupancy, mean_coord, mean_count, cov [N,6] (packed sqrt
    covariance), optional traversal/touch_time/incident and, for NDT-TM,
    intensity [N,2] + hit_count/miss_count.
    """
    base = cfg.base
    flags = base.ray_flags
    b = _unpack_batch(batch, base)
    res = jnp.float32(base.resolution)

    ray_valid = b["valid"]
    use_xk = bool(base.pallas_expand and base.unordered_walk and base.group_cap
                  and not (flags & RayFlag.EXCLUDE_RAY))
    if use_xk:
        from ohm_tpu.ops import expand_pallas
        use_xk = expand_pallas.expand_eligible(base, b)
    if use_xk:
        # Fused expand kernel (ops.expand_pallas): walk + slot resolve +
        # validity/EXCLUDE_ORIGIN masking in one Pallas pass; the miss
        # phase's voxel-local geometry reads the kernel's voxel planes
        # (with_vox).  Bit-identical to the XLA chain below
        # (tests/test_expand_pallas.py, tests/test_tpu_integrate.py NDT
        # differentials).
        walk_flat, walk_trav2d, xaux = expand_pallas.expand_keys(
            b, base, exclude_origin=bool(flags & RayFlag.EXCLUDE_ORIGIN),
            with_trav=base.with_traversal, with_vox=True,
            interpret=base.pallas_expand == 2)
        B, S = walk_flat.shape
        walk_vox = xaux["vox"]
        walk_end_enter = xaux["end_enter"]
        walk_missed_n = xaux["missed_n"]
        overflow_n = jnp.sum(
            jnp.where(xaux["overflow"] & ray_valid, 1, 0)).astype(jnp.int32)
    else:
        if base.unordered_walk and base.group_cap:
            from ohm_tpu.ops.ddawalk import walk_rays_unordered

            walk = walk_rays_unordered(
                b["start_abs"], b["end_abs"], b["start_frac"],
                b["direction"], b["length"], base.resolution, base.max_steps)
        else:
            walk = walk_rays(
                b["start_abs"], b["end_abs"], b["start_frac"],
                b["direction"], b["length"], base.resolution, base.max_steps,
                total_cap=base.walk_cap or None,
            )
        B, S = walk["valid"].shape

        rec_valid = walk["valid"] & ray_valid[:, None]
        if flags & RayFlag.EXCLUDE_ORIGIN:
            first_col = walk.get("first")
            if first_col is None:
                first_col = jnp.concatenate([jnp.ones((B, 1), bool), jnp.zeros((B, S - 1), bool)], axis=1)
            rec_valid = rec_valid & ~(first_col & b["exclude_start"][:, None])
        if flags & RayFlag.EXCLUDE_RAY:
            rec_valid = jnp.zeros_like(rec_valid)

        walk_flat, walk_missed = _resolve_slots(walk["voxels"], b.get("rmin"), b.get("corner_slots"), base, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        walk_flat = jnp.where(rec_valid, walk_flat, base.sentinel)
        walk_vox = walk["voxels"]
        walk_end_enter = walk["end_enter"]
        walk_missed_n = jnp.sum(
            jnp.where(rec_valid & walk_missed, 1, 0)).astype(jnp.int32)
        overflow_n = (jnp.sum(jnp.where(walk["overflow"] & ray_valid, 1, 0))
                      + walk["truncated"]).astype(jnp.int32)
        if base.with_traversal:
            walk_trav2d = jnp.where(rec_valid, walk["exits"] - walk["enters"], 0.0)

    end_flat, end_missed = _resolve_slots(b["end_abs"], b.get("rmin"), b.get("corner_slots"), base, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
    # NDT ignores kRfExcludeSample / state exclusions (ohm/RayMapperNdt.cpp
    # applies the hit whenever the sample is not folded into the ray).
    end_is_hit = b["is_sample"] & ray_valid
    end_is_miss = b["end_as_miss"] & ray_valid
    if flags & RayFlag.EXCLUDE_RAY:
        end_is_miss = jnp.zeros_like(end_is_miss)

    N = B * S
    flat_ids = walk_flat.reshape(-1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    walk_trav_flat = None
    if base.with_traversal:
        walk_trav_flat = walk_trav2d.reshape(-1)

    # Group compaction (see integrate.expand_records_jit): shrink the walk
    # stream before the per-record classification gather and the global sort.
    # The original record position rides as a payload so the NDT miss phase
    # can still recover each record's ray geometry (ray id = pos // S).
    compaction_dropped = jnp.int32(0)
    G = base.group_size
    if base.group_cap and B % G == 0 and base.group_cap < G * S:
        from ohm_tpu.ops.integrate import group_rows
        ops = [group_rows(flat_ids, B, S, G), group_rows(pos, B, S, G)]
        if base.with_traversal:
            ops.append(group_rows(walk_trav_flat, B, S, G))
        n_valid = jnp.sum(jnp.where(ops[0] < base.sentinel, 1, 0))
        ops = jax.lax.sort(tuple(ops), num_keys=1, dimension=1)
        ops = [o[:, :base.group_cap] for o in ops]
        n_kept = jnp.sum(jnp.where(ops[0] < base.sentinel, 1, 0))
        compaction_dropped = (n_valid - n_kept).astype(jnp.int32)
        ids_c = ops[0].reshape(-1)
        pos_c = ops[1].reshape(-1)
        if base.with_traversal:
            walk_trav_flat = ops[2].reshape(-1)
    else:
        ids_c, pos_c = flat_ids, pos
    M = ids_c.shape[0]

    # ---------------------------------------------------------------- #
    # Miss phase: classify records by whether the voxel holds a Gaussian.
    # NDT math applies for observed voxels with count >= threshold
    # (calculateMissNdt branch structure, ohm/CovarianceVoxelCompute.h:557-580).
    # One dense elementwise plane + ONE gather per record (instead of separate
    # occupancy and count gathers — record gathers are latency-bound at
    # ~25 ns/element, the dense plane is HBM-streaming).
    from ohm_tpu.ops import blocked, deposit_pallas

    use_pallas = (base.pallas_deposit and not base.with_traversal
                  and deposit_pallas.deposit_ok(base))
    K = min(cfg.miss_k, M)
    if use_pallas:
        # Sorted-stream miss phase: ONE flat-id sort (original positions as
        # payload), then the classification gather runs as the MXU gather
        # kernel over the sorted stream (~4.6 vs ~11 ms per 1M records:
        # ops.deposit_pallas.gather_plane), compaction selects in sorted
        # order, and the std deposit below reuses THE SAME sorted stream via
        # masked keys + unmasked bounds — no second full-stream sort and no
        # scatter back to original order anywhere.
        sids, spos = jax.lax.sort((ids_c, pos_c), num_keys=1)
        gauss8 = (~_unobserved(arena["occupancy"])
                  & (arena["mean_count"] >= cfg.sample_threshold)
                  ).astype(jnp.int8)
        is_ndt = deposit_pallas.gather_plane(
            gauss8, sids, base, interpret=base.pallas_deposit == 2) > 0
        seq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).squeeze(-1)
        sort_key = jnp.where(is_ndt, seq, seq + M)
        skey = jax.lax.sort((sort_key,), num_keys=1)[0][:K]
        active_k = skey < M
        sel_k = jnp.where(active_k, skey, skey - M)  # SORTED-stream positions
        # Graceful overflow: flagged records beyond K revert to standard
        # misses.  Selection is rank-in-sorted-order, so the expensive rank
        # cumsum only runs when the count actually overflows K.
        n_flag = jnp.sum(is_ndt.astype(jnp.int32))
        ndt_applied = jax.lax.cond(
            n_flag <= K,
            lambda: is_ndt,
            lambda: is_ndt & (blocked.cumsum(is_ndt.astype(jnp.int32))
                              - is_ndt.astype(jnp.int32) < K))
        overflow_ndt = jnp.maximum(n_flag - K, 0)
        ids_k = jnp.where(active_k, sids[sel_k], base.sentinel)
        pos_k = spos[sel_k]  # original record position in the [B, S] walk
    else:
        gauss_plane = (~_unobserved(arena["occupancy"])
                       & (arena["mean_count"] >= cfg.sample_threshold))
        is_ndt = gauss_plane[ids_c] & (ids_c != base.sentinel)

        # Compact: flagged records first, original order preserved within
        # groups.  The key encodes the position (flagged keep pos, unflagged
        # get pos + M), so ONE sort operand suffices — position and
        # flaggedness both decode from the sorted key.
        mpos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).squeeze(-1)
        sort_key = jnp.where(is_ndt, mpos, mpos + M)
        skey = jax.lax.sort((sort_key,), num_keys=1)[0][:K]
        active_k = skey < M
        sel_k = jnp.where(active_k, skey, skey - M)
        # Graceful overflow: flagged records beyond K revert to std misses.
        ndt_rank = blocked.cumsum(is_ndt.astype(jnp.int32)) - is_ndt.astype(jnp.int32)
        ndt_applied = is_ndt & (ndt_rank < K)
        overflow_ndt = jnp.sum((is_ndt & ~ndt_applied).astype(jnp.int32))

        ids_k = ids_c[sel_k]
        ids_k = jnp.where(active_k, ids_k, base.sentinel)
        pos_k = pos_c[sel_k]  # original record position in the [B, S] walk
    vox_k = walk_vox.reshape(N, 3)[pos_k]
    ray_k = pos_k // S

    # Voxel-local geometry: positions relative to the visited voxel centre.
    start_abs_k = b["start_abs"][ray_k]
    end_abs_k = b["end_abs"][ray_k]
    sensor_k = b["start_frac"][ray_k] + (start_abs_k - vox_k).astype(jnp.float32) * res
    sample_k = b["end_frac"][ray_k] + (end_abs_k - vox_k).astype(jnp.float32) * res

    cov_k = arena["cov"][ids_k]
    mean_k = subvoxel_jnp.sub_voxel_to_local_coord(arena["mean_coord"][ids_k], base.resolution)

    delta_k, is_miss_k = ndtops.ndt_miss_delta(
        cov_k, sensor_k, sample_k, mean_k, cfg.adaptation_rate, cfg.sensor_noise
    )
    delta_k = jnp.where(active_k, delta_k, 0.0)
    is_miss_k = is_miss_k & active_k

    # Aggregate deltas per voxel (sort K stream by id, segmented scan).
    # Traversal of the Gaussian-handled records rides here too: the
    # reference accumulates traversal on EVERY visited voxel regardless of
    # the NDT branch (ohm/RayMapperNdt.cpp:217-225), while the standard
    # deposit below only sees std_miss records.
    k_ops = [ids_k, delta_k, is_miss_k.astype(jnp.float32)]
    if base.with_traversal:
        trav_k = jnp.where(active_k, walk_trav_flat[sel_k], 0.0)
        k_ops.append(trav_k)
    sorted_k = jax.lax.sort(tuple(k_ops), num_keys=1)
    kids, kdeltas, kmisses = sorted_k[0], sorted_k[1], sorted_k[2]
    k_payloads = [(kdeltas, "sum"), (kmisses, "sum")]
    if base.with_traversal:
        k_payloads.append((sorted_k[3], "sum"))
    k_last, k_red = _segment_reduce(kids, k_payloads, base)
    delta_tot, miss_tot = k_red[0], k_red[1]
    if use_pallas and not cfg.ndt_tm and not base.with_traversal:
        # Sparse delta stream for the deposit kernel: kids is already
        # id-sorted with sentinels last; exactly one nonzero value per voxel
        # (its segment-last record) — no arena-shaped scatter at all.
        pending_delta = (kids << 1,
                         jnp.where(k_last & (kids != base.sentinel),
                                   delta_tot, 0.0))
        k_idx = None
    else:
        k_idx = _unique_scatter_indices(kids, k_last, base)
        pending_delta = jnp.zeros(arena["occupancy"].shape, jnp.float32).at[k_idx].set(
            jnp.where(k_last, delta_tot, 0.0), unique_indices=True
        )
    ndt_trav = None
    if base.with_traversal:
        ndt_trav = (k_idx, jnp.where(k_last, k_red[2], 0.0))
    if cfg.ndt_tm:
        pending_tm_miss = jnp.zeros(arena["occupancy"].shape, jnp.float32).at[k_idx].set(
            jnp.where(k_last, miss_tot, 0.0), unique_indices=True
        )

    # ---------------------------------------------------------------- #
    # Standard (non-Gaussian) miss + hit counts via the occupancy machinery.
    # (Under the Pallas path, ndt_applied is in SORTED-stream order and the
    # std-miss mask is applied to the sorted ids instead.)
    std_miss = None if use_pallas else (ids_c != base.sentinel) & ~ndt_applied
    end_any = end_is_hit | end_is_miss
    end_trav = (jnp.where(end_any, b["length"] - walk_end_enter, 0.0)
                if base.with_traversal else None)
    fused_dropped = jnp.int32(0)
    compacted = bool(base.group_cap) and B % G == 0 and base.group_cap < G * S
    arena = dict(arena)
    if base.with_traversal and ndt_trav is not None:
        # Gaussian-handled records' traversal (deposited by the miss phase;
        # the std deposit below only carries std_miss records' traversal).
        arena["traversal"] = arena["traversal"].at[ndt_trav[0]].add(
            ndt_trav[1], unique_indices=True)
    if use_pallas:
        # MXU one-hot matmul deposit + fused NDT sweep (ops.deposit_pallas):
        # the walk stream REUSES the miss phase's flat-sort — Gaussian-
        # handled records mask to sentinel keys (breaking strict sortedness),
        # with chunk bounds computed from the unmasked ids; the (small)
        # sorted end/sample stream deposits into the same count planes in a
        # second kernel pass before the fused NDT sweep (including the
        # miss-delta plane) — replacing the unique scatter AND the dense
        # apply below.  Bit-identical (tests/test_pallas_deposit.py).
        std_miss_s = (sids != base.sentinel) & ~ndt_applied
        walk_keys = jnp.where(std_miss_s, sids << 1, base.sentinel << 1)
        end_keys = jax.lax.sort(
            ((jnp.where(end_any, end_flat, base.sentinel) << 1)
             | end_is_hit.astype(jnp.int32),), num_keys=1)[0]
        new_occupancy, touched_std = deposit_pallas.deposit_and_sweep_ndt(
            arena["occupancy"], walk_keys, pending_delta, base,
            interpret=base.pallas_deposit == 2,
            bounds_key=sids << 1, key2_sorted=end_keys)
    elif base.row_cap > 0 and compacted:
        # Fused two-level deposit (integrate.apply_records_fused_jit):
        # compaction rows are already sorted, so per-row PARTIAL std-miss
        # counts come from segment sums (weight masks out Gaussian-handled
        # records), per-row voxel-lasts compact by one row sort, and the
        # merge with raw end records happens in one SMALL global sort —
        # replacing this phase's full-stream sort.
        from ohm_tpu.ops.integrate import _fused_row_partials, _fused_merge_deposit
        cap_r = base.group_cap
        # Same scratch-tail clamp as apply_records_fused_jit: an escalated
        # row_cap degrades to counted drops, never a trace-time error.
        cap2 = min(base.row_cap, cap_r,
                   max(1, (base.scatter_pad - B) // max(1, M // cap_r)))
        ids2 = ids_c.reshape(-1, cap_r)
        kc, pcw, tcw, fused_dropped = _fused_row_partials(
            ids2, std_miss.astype(jnp.float32),
            jnp.where(std_miss, walk_trav_flat, 0.0)
            if base.with_traversal else None, cap2, base)
        ids_e2 = jnp.where(end_any, end_flat, base.sentinel)
        packed_e = jnp.where(
            end_any,
            (end_is_hit.astype(jnp.uint32) << 16) | end_is_miss.astype(jnp.uint32),
            jnp.uint32(0))
        trav_e = (jnp.where(end_any, end_trav, 0.0)
                  if base.with_traversal else None)
        pending_counts, idx_s, real_last_m, trav_tot_m = _fused_merge_deposit(
            arena["occupancy"].shape, kc, pcw, tcw, ids_e2, packed_e, trav_e, base)
        if base.with_traversal:
            arena["traversal"] = arena["traversal"].at[idx_s].add(
                jnp.where(real_last_m, trav_tot_m, 0.0), unique_indices=True,
                mode="promise_in_bounds")
        touched_std = jnp.sum(real_last_m.astype(jnp.int32))
    else:
        key = jnp.concatenate([
            (jnp.where(std_miss, ids_c, base.sentinel) << 1),
            (jnp.where(end_any, end_flat, base.sentinel) << 1) | end_is_hit.astype(jnp.int32),
        ])
        trav_payloads = []
        if base.with_traversal:
            trav_payloads.append(jnp.concatenate([walk_trav_flat, end_trav]).astype(jnp.float32))

        sorted_all = jax.lax.sort((key,) + tuple(trav_payloads), num_keys=1)
        key_s = sorted_all[0]
        # Position-diff reduce (no scan): see integrate.sorted_hit_miss_counts.
        ids_s, first_s, last, n_hit, n_miss = sorted_hit_miss_counts(key_s)

        idx_s = _unique_scatter_indices(ids_s, last, base)
        cap = jnp.float32(65535.0)
        packed = (jnp.minimum(n_hit, cap).astype(jnp.uint32) << 16) | jnp.minimum(n_miss, cap).astype(jnp.uint32)
        # Zero sentinel-group records too (as in _apply_occupancy_dense):
        # the sentinel segment's last record otherwise deposits its capped
        # counts into a scratch-tail slot and the dense sweep turns it into
        # a garbage "observed" value accumulating across batches.
        packed = jnp.where(last & (ids_s != base.sentinel), packed, jnp.uint32(0))
        pending_counts = jnp.zeros(arena["occupancy"].shape, jnp.uint32).at[idx_s].set(packed, unique_indices=True)

        if base.with_traversal:
            trav_tot = sorted_nonneg_sums(sorted_all[1], first_s)
            arena["traversal"] = arena["traversal"].at[idx_s].add(
                jnp.where(last, trav_tot, 0.0), unique_indices=True)
        touched_std = jnp.sum((last & (ids_s != base.sentinel)).astype(jnp.int32))

    # ---------------------------------------------------------------- #
    # Dense occupancy apply: standard counts + NDT miss deltas.
    # NDT semantics: no kRfExclude* state matrix; hits via occupancyAdjustUp
    # (clamp max), misses via occupancyAdjustDown (clamp min), saturation
    # respected (ohm/RayMapperNdt.cpp:214-215,349-351).
    # (The Pallas deposit fuses this sweep in-kernel —
    # deposit_pallas._ndt_sweep_block mirrors it op-for-op.)
    initial = arena["occupancy"]
    if not use_pallas:
        unobs = _unobserved(initial)
        n_hit_d = (pending_counts >> 16).astype(jnp.float32)
        n_miss_d = (pending_counts & jnp.uint32(0xFFFF)).astype(jnp.float32)
        total = (n_hit_d * jnp.float32(base.hit_value)
                 + n_miss_d * jnp.float32(base.miss_value)
                 + pending_delta)
        base_val = jnp.where(unobs, 0.0, initial)
        value = base_val + total
        value = jnp.where(total > 0, jnp.minimum(value, jnp.float32(base.max_value)), value)
        value = jnp.where(total < 0, jnp.maximum(value, jnp.float32(base.min_value)), value)
        touched = (pending_counts != 0) | (pending_delta != 0)
        saturated = ~unobs & (
            (initial <= jnp.float32(base.saturation_min)) | (initial >= jnp.float32(base.saturation_max))
        )
        keep = ~touched | saturated
        new_occupancy = jnp.where(keep, initial, value)

    # ---------------------------------------------------------------- #
    # Hit phase: batch covariance merge per unique sample voxel.
    s_ids = jnp.where(end_is_hit, end_flat, base.sentinel)
    z = jnp.where(end_is_hit[:, None], b["end_frac"], 0.0)
    zz = jnp.where(end_is_hit[:, None], ndtops._outer6(b["end_frac"]), 0.0)

    # Secondary sort key: ORIGINAL batch ray index.  The intensity merge
    # below is a sequential recursion (order-dependent); rayflow wires may be
    # snake-permuted (mapping.batch.snake_perm), so same-voxel samples must
    # be re-ordered by their source position to match the reference's
    # sequential processing.  Segmented wires are already in batch order
    # (iota keeps the sort a stable no-op within voxels).
    order_key = b.get("ray_order")
    if order_key is None:
        order_key = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).squeeze(-1)

    flat_ops = [s_ids, order_key, end_is_hit.astype(jnp.float32)]
    flat_ops += [z[:, c] for c in range(3)]
    flat_ops += [zz[:, c] for c in range(6)]
    extra_payload_start = len(flat_ops)
    if cfg.ndt_tm:
        # Per-sample consistency checks against batch-start state
        # (calculateHitMissUpdateOnHit) and intensity Welford stats.
        cov_sample = arena["cov"][jnp.where(end_is_hit, end_flat, base.sentinel)]
        mean_sample = subvoxel_jnp.sub_voxel_to_local_coord(
            arena["mean_coord"][jnp.where(end_is_hit, end_flat, base.sentinel)], base.resolution)
        count_sample = arena["mean_count"][jnp.where(end_is_hit, end_flat, base.sentinel)]
        occ_sample = initial[jnp.where(end_is_hit, end_flat, base.sentinel)]
        sensor_local = b["start_frac"] + (b["start_abs"] - b["end_abs"]).astype(jnp.float32) * res
        _, inc_hit, inc_miss = ndtops.tm_hit_consistency(
            cov_sample, sensor_local, b["end_frac"], mean_sample, count_sample, occ_sample,
            {"reinit_threshold": cfg.reinit_threshold, "reinit_count": cfg.reinit_count,
             "sensor_noise": cfg.sensor_noise, "adaptation_rate": cfg.adaptation_rate,
             "sample_threshold": cfg.sample_threshold},
        )
        # Rayflow wires carry intensity inline; the segmented path ships it
        # as a separate per-segment array.
        intensity = b["intensity"] if "intensity" in b else batch["intensity"]
        flat_ops += [
            (inc_hit & end_is_hit).astype(jnp.float32),
            (inc_miss & end_is_hit).astype(jnp.float32),
            jnp.where(end_is_hit, intensity, 0.0),
            jnp.where(end_is_hit, intensity * intensity, 0.0),
        ]
    if base.with_touch_time:
        flat_ops.append(jnp.where(end_is_hit, b["touch_enc"], 0).astype(jnp.uint32))
    if base.with_incident:
        inc_vec = jnp.where(end_is_hit[:, None], -b["direction"], 0.0)
        flat_ops += [inc_vec[:, c] for c in range(3)]

    sorted_s = jax.lax.sort(tuple(flat_ops), num_keys=2)
    s_sorted = sorted_s[0]
    payloads = [(sorted_s[2], "sum")]  # k
    payloads += [(sorted_s[3 + c], "sum") for c in range(3)]  # z sums
    payloads += [(sorted_s[6 + c], "sum") for c in range(6)]  # zz sums
    j = extra_payload_start
    if cfg.ndt_tm:
        payloads += [(sorted_s[j], "sum"), (sorted_s[j + 1], "sum"),
                     (sorted_s[j + 2], "sum"), (sorted_s[j + 3], "sum")]
        j += 4
    if base.with_touch_time:
        payloads.append((sorted_s[j], "max"))
        j += 1
    if base.with_incident:
        payloads += [(sorted_s[j + c], "sum") for c in range(3)]
        j += 3

    s_last, s_red = _segment_reduce(s_sorted, payloads, base)
    k = s_red[0]
    z_sum = jnp.stack(s_red[1:4], axis=-1)
    zz_sum = jnp.stack(s_red[4:10], axis=-1)
    ri = 10

    active = s_last & (k > 0) & (s_sorted != base.sentinel)
    s_idx = _unique_scatter_indices(s_sorted, s_last, base)

    cov_old = arena["cov"][s_sorted]
    mean_old = subvoxel_jnp.sub_voxel_to_local_coord(arena["mean_coord"][s_sorted], base.resolution)
    count_old = arena["mean_count"][s_sorted]
    occ_old = initial[s_sorted]  # batch-start occupancy for reinit decisions

    cov_new, mean_new, count_new, reset = ndtops.merge_covariance_batch(
        cov_old, mean_old, count_old, occ_old, k, z_sum, zz_sum,
        base.resolution, cfg.reinit_threshold, cfg.reinit_count,
    )
    cov_w = jnp.where(active[..., None], cov_new, cov_old)
    cov_w = jnp.where(s_last[..., None], cov_w, 0.0)
    arena["cov"] = arena["cov"].at[s_idx].set(cov_w, unique_indices=True)

    coord_new = subvoxel_jnp.sub_voxel_coord(mean_new, base.resolution)
    coord_w = jnp.where(active, coord_new, arena["mean_coord"][s_sorted])
    coord_w = jnp.where(s_last, coord_w, jnp.uint32(0))
    arena["mean_coord"] = arena["mean_coord"].at[s_idx].set(coord_w, unique_indices=True)
    cnt_w = jnp.where(active, count_new.astype(jnp.uint32), count_old)
    cnt_w = jnp.where(s_last, cnt_w, jnp.uint32(0))
    arena["mean_count"] = arena["mean_count"].at[s_idx].set(cnt_w, unique_indices=True)

    if cfg.ndt_tm:
        hit_inc = s_red[ri]
        miss_inc = s_red[ri + 1]
        int_sum = s_red[ri + 2]
        ri += 4  # int_sq payload retained in the sort for layout stability
        # EXACT intensity merge (reference per-sample recursion,
        # ohm/CovarianceVoxelCompute.h:391-411 calculateIntensityUpdateOnHit).
        # The recursion telescopes: with C_j = n_j * cov_j and n_j = n0 + j,
        #   C_j = C_{j-1} + delta_j^2 / n_j,   delta_j = mean_{j-1} - x_j,
        # so the batch update is C_k = C_0 + sum_j delta_j^2/n_j where
        # mean_{j-1} comes from the segment-local intensity prefix sum —
        # computable at every sorted position with ops.blocked.segment_sums
        # (samples are contiguous per voxel after the stable sample sort,
        # in batch ray order — the order the oracle recursion uses).
        # A fresh/reset voxel's first sample contributes C_1 =
        # initial_intensity_covariance and no delta term.
        from ohm_tpu.ops import blocked as _blocked

        int_sorted = sorted_s[extra_payload_start + 2]
        hit_sorted = sorted_s[2]  # 1.0 at hit records, 0.0 at padding
        im_old = arena["intensity"][s_sorted, 0]
        ic_old = arena["intensity"][s_sorted, 1]
        n0 = jnp.where(reset, 0.0, count_old.astype(jnp.float32))
        im0 = jnp.where(reset, 0.0, im_old)
        s_first = jnp.concatenate([jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
        # In-segment 1-based sample index j (hit records only; non-hit
        # padding records carry hit_sorted == 0 and contribute nothing).
        j_incl = _blocked.segment_sums(hit_sorted, s_first)
        prefix_incl = _blocked.segment_sums(int_sorted, s_first)
        n_j = n0 + j_incl
        prev_cnt = n_j - 1.0
        mean_prev = (n0 * im0 + (prefix_incl - int_sorted)) / jnp.maximum(prev_cnt, 1.0)
        delta = mean_prev - int_sorted
        term = jnp.where((hit_sorted > 0) & (prev_cnt > 0),
                         delta * delta / jnp.maximum(n_j, 1.0), 0.0)
        q_inc = _blocked.segment_sums(term, s_first)  # valid at segment lasts
        kf = jnp.maximum(k, 1.0)
        n_new = n0 + kf
        q_base = jnp.where(n0 > 0, n0 * ic_old, jnp.float32(cfg.initial_intensity_covariance))
        q = q_base + q_inc
        im_new = (n0 * im0 + int_sum) / n_new
        ic_new = q / n_new
        int_new = jnp.stack([jnp.where(active, im_new, im_old), jnp.where(active, ic_new, ic_old)], axis=-1)
        int_new = jnp.where(s_last[..., None], int_new, 0.0)
        arena["intensity"] = arena["intensity"].at[s_idx].set(int_new, unique_indices=True)

        # Hit/miss counters: a reset overwrites with this batch's tallies,
        # otherwise tallies accumulate (reference resets then increments —
        # calculateHitMissUpdateOnHit).  NDT miss-phase tallies (rays crossing
        # the Gaussian) add densely afterwards.
        old_hit = arena["hit_count"][s_sorted]
        old_miss = arena["miss_count"][s_sorted]
        new_hit = jnp.where(reset, hit_inc, old_hit.astype(jnp.float32) + hit_inc)
        new_miss = jnp.where(reset, miss_inc, old_miss.astype(jnp.float32) + miss_inc)
        new_hit = jnp.where(active, new_hit, old_hit.astype(jnp.float32))
        new_miss = jnp.where(active, new_miss, old_miss.astype(jnp.float32))
        arena["hit_count"] = arena["hit_count"].at[s_idx].set(
            jnp.where(s_last, new_hit, 0.0).astype(jnp.uint32), unique_indices=True)
        arena["miss_count"] = arena["miss_count"].at[s_idx].set(
            jnp.where(s_last, new_miss, 0.0).astype(jnp.uint32), unique_indices=True)
        arena["miss_count"] = arena["miss_count"] + pending_tm_miss.astype(jnp.uint32)

    arena["occupancy"] = new_occupancy

    # Touch time / incident normals (same semantics as the occupancy pipeline).
    if base.with_touch_time:
        touch_max = s_red[ri]
        ri += 1
        old_touch = arena["touch_time"][s_sorted]
        new_touch = jnp.where(active, touch_max, old_touch)
        arena["touch_time"] = arena["touch_time"].at[s_idx].set(
            jnp.where(s_last, new_touch, jnp.uint32(0)), unique_indices=True)
    if base.with_incident:
        inc_sums = jnp.stack(s_red[ri:ri + 3], axis=-1)
        ri += 3
        old_packed = arena["incident"][s_sorted]
        old_normal = subvoxel_jnp.decode_normal(old_packed)
        has_old = jnp.any(old_normal != 0, axis=-1)
        prior = jnp.where(reset, 0.0, count_old.astype(jnp.float32))
        w = jnp.where(has_old, prior, 0.0)
        merged = old_normal * w[:, None] + inc_sums
        norm = jnp.sqrt(jnp.sum(merged * merged, axis=-1))
        unit = jnp.where(norm[:, None] > 1e-6, merged / jnp.maximum(norm, 1e-12)[:, None], 0.0)
        new_packed = jnp.where(active, subvoxel_jnp.encode_normal(unit), old_packed)
        arena["incident"] = arena["incident"].at[s_idx].set(
            jnp.where(s_last, new_packed, jnp.uint32(0)), unique_indices=True)

    missed_updates = (
        walk_missed_n
        + jnp.sum(jnp.where((end_is_hit | end_is_miss) & end_missed, 1, 0))
    ).astype(jnp.int32)
    # Per-row unique-voxel high-water mark (sizes the fused deposit's
    # row_cap, as in expand_records_jit).
    if compacted:
        ids_r = ids_c.reshape(-1, base.group_cap)
        last_r = jnp.concatenate(
            [ids_r[:, 1:] != ids_r[:, :-1],
             jnp.ones((ids_r.shape[0], 1), bool)], axis=1)
        row_lasts_max = jnp.max(jnp.sum(
            (last_r & (ids_r != base.sentinel)).astype(jnp.int32), axis=1))
    else:
        row_lasts_max = jnp.int32(-1)

    stats = {
        "missed_updates": missed_updates,
        "overflow": overflow_n,
        "touched": touched_std,
        "ndt_overflow": overflow_ndt,
        "ndt_flagged": jnp.sum(is_ndt.astype(jnp.int32)),
        "compaction_dropped": compaction_dropped,
        "dropped_updates": fused_dropped,
        "row_lasts_max": row_lasts_max,
    }
    return arena, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))
def integrate_ndt_jit(arena, batch, cfg: NdtConfig):
    return integrate_ndt(arena, batch, cfg)
