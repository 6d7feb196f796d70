"""Fused TSDF ray-batch integration.

TPU-native replacement for ohmgpu/gpu/TsdfUpdate.cl (per-visit 64-bit CAS on
the packed {weight, distance} pair, ohmgpu/GpuTsdfMap.cpp): per-record SDF
weights are computed vectorised, reduced per voxel with the segmented-scan
machinery, deposited through two unique-index scatters, and blended with the
stored voxel state in a dense arena sweep — no gathers, no CAS.

Batch-vs-sequential: the reference truncates the *blended* distance after
every visit; the batch form blends all of a batch's contributions before one
truncation.  Identical when no intermediate truncation triggers; bounded by
the truncation distance otherwise (the reference GPU is itself order-random
under CAS).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ohm_tpu.ops.ddawalk import walk_rays
from ohm_tpu.ops.integrate import (
    IntegrateConfig,
    _resolve_slots,
    _unique_scatter_indices,
    _unpack_batch,
)


@dataclasses.dataclass(frozen=True)
class TsdfConfig:
    """Static TSDF parameters (reference: ohm/VoxelTsdf.h:27-37)."""

    base: IntegrateConfig
    max_weight: float = 1e4
    default_truncation_distance: float = 0.1
    dropoff_epsilon: float = 0.0
    sparsity_compensation_factor: float = 1.0
    #: Apply truncation at every visit in reference ray order (exact
    #: semantics of ohm/VoxelTsdfCompute.h used per visit) instead of once
    #: per batch.  Costs one extra sort key + two stream gathers.
    per_visit: bool = True


def integrate_tsdf(arena: dict, batch: dict, cfg: TsdfConfig):
    """Integrate one packed ray batch into tsdf_weight/tsdf_distance layers."""
    base = cfg.base
    b = _unpack_batch(batch, base)
    res = jnp.float32(base.resolution)

    ray_valid = b["valid"]
    use_xk = bool(base.pallas_expand and base.unordered_walk and base.group_cap)
    if use_xk:
        from ohm_tpu.ops import expand_pallas
        use_xk = expand_pallas.expand_eligible(base, b)
    if use_xk:
        # Fused expand kernel (ops.expand_pallas): walk + slot resolve +
        # validity masking in one Pallas pass, with the per-record absolute
        # voxel coords emitted as kernel planes (with_vox) — TSDF consumes
        # them for the voxel-local sdf below.  Keys and voxels are
        # bit-identical to the XLA chain (tests/test_expand_pallas.py).
        walk_flat, _, xaux = expand_pallas.expand_keys(
            b, base, exclude_origin=False, with_trav=False, with_vox=True,
            interpret=base.pallas_expand == 2)
        B, S = walk_flat.shape
        vox_w = xaux["vox"]
        # Weight masking uses key-sentinel state: a valid-but-missed record
        # differs from the XLA chain only in payloads attached to sentinel
        # keys, which every downstream reduction masks (real_seg / id !=
        # sentinel), so the final arena state stays bit-identical.
        rec_mask = walk_flat != base.sentinel
        walk_missed_n = xaux["missed_n"]
        overflow_n = jnp.sum(jnp.where(xaux["overflow"] & ray_valid, 1, 0)).astype(jnp.int32)
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

        walk_flat, walk_missed = _resolve_slots(walk["voxels"], b.get("rmin"), b.get("corner_slots"), base, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        walk_flat = jnp.where(rec_valid, walk_flat, base.sentinel)
        vox_w = walk["voxels"]
        rec_mask = rec_valid
        walk_missed_n = jnp.sum(jnp.where(rec_valid & walk_missed, 1, 0)).astype(jnp.int32)
        overflow_n = (jnp.sum(jnp.where(walk["overflow"] & ray_valid, 1, 0))
                      + walk["truncated"]).astype(jnp.int32)
    end_flat, end_missed = _resolve_slots(b["end_abs"], b.get("rmin"), b.get("corner_slots"), base, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
    # The reference TSDF walk includes the sample voxel
    # (RayMapperTsdf.cpp:178 walks with no exclusion flags); our walk stops
    # before the end voxel, so final segments contribute an explicit end
    # record.  Non-final segments' boundary voxels belong to the next segment.
    end_active = (b["is_sample"] | b["end_as_miss"]) & ray_valid
    end_flat_masked = jnp.where(end_active, end_flat, base.sentinel)

    # SDF per record: sdf = full_len - dot(c - sensor, dir)
    #               = full_len - t0 + dot(p0 - c, dir)
    # with p0 - c = start_frac + (start_abs - voxel) * res (voxel-local f32).
    # Walk records [B,S]:
    q_w = b["start_frac"][:, None, :] + (b["start_abs"][:, None, :] - vox_w).astype(jnp.float32) * res
    proj_w = jnp.sum(q_w * b["direction"][:, None, :], axis=-1)
    sdf_w = (b["full_length"] - b["t0"])[:, None] + proj_w
    # End records [B]: voxel = end_abs.
    q_e = b["start_frac"] + (b["start_abs"] - b["end_abs"]).astype(jnp.float32) * res
    sdf_e = (b["full_length"] - b["t0"]) + jnp.sum(q_e * b["direction"], axis=-1)

    trunc = jnp.float32(cfg.default_truncation_distance)

    # With the default weighting (no dropoff, sparsity factor 0/1 — the
    # reference's own defaults, ohm/VoxelTsdf.h:27-37) every valid record's
    # update weight is exactly 1.0, so the weight never needs to ride the
    # sorts as a payload operand: it is (id != sentinel) after any reorder.
    # Sort cost scales with operand count (~1.3 ns/elem/word), so this drops
    # one f32 word from both the group-compaction row sort and the global
    # sort on the common path.
    uniform_w = (cfg.dropoff_epsilon <= 0.0
                 and cfg.sparsity_compensation_factor in (0.0, 1.0))

    def weight_of(sdf):
        w = jnp.ones_like(sdf)
        if cfg.dropoff_epsilon > 0:
            w = w * (trunc + sdf) / (trunc - jnp.float32(cfg.dropoff_epsilon))
        w = jnp.maximum(w, 0.0)
        if cfg.sparsity_compensation_factor > 0:
            w = jnp.where(jnp.abs(sdf) < trunc, w * jnp.float32(cfg.sparsity_compensation_factor), w)
        return w

    if uniform_w:
        w_w = rec_mask.astype(jnp.float32)
        w_e = end_active.astype(jnp.float32)
    else:
        w_w = jnp.where(rec_mask, weight_of(sdf_w), 0.0)
        w_e = jnp.where(end_active, weight_of(sdf_e), 0.0)

    walk_ids = walk_flat.reshape(-1)
    walk_w = w_w.reshape(-1)
    walk_wsdf = (w_w * sdf_w).reshape(-1)
    # Visit-order key: the oracle applies calculateTsdf in ray order (each
    # segment/ray contributes at most one visit per voxel), so a per-voxel
    # secondary sort on the segment index reproduces the reference's
    # per-visit sequence exactly (segments are emitted ray-major).  Rayflow
    # wires may be row-permuted (snake ordering) — the ORIGINAL ray index
    # rides in the wire (b["ray_order"]) and keys the sequence instead.
    row_order = b.get("ray_order")
    if row_order is None:
        row_order = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).squeeze(-1)
    ridx = jnp.broadcast_to(row_order[:, None], (B, S)).reshape(-1)
    compaction_dropped = jnp.int32(0)
    G = base.group_size
    if base.group_cap and B % G == 0 and base.group_cap < G * S:
        # Group compaction (see integrate.expand_records_jit): sentinel-keyed
        # padding sorts to the back of each 64-segment row and is truncated
        # at the host-computed exact cap; only the payloads the chosen
        # semantics actually consume ride the row sort (the visit-order key
        # only matters per-visit; the weight only when non-uniform).
        from ohm_tpu.ops.integrate import group_rows
        row_ops = [group_rows(walk_ids, B, S, G)]
        if cfg.per_visit:
            row_ops.append(group_rows(ridx, B, S, G))
        if not uniform_w:
            row_ops.append(group_rows(walk_w, B, S, G))
        row_ops.append(group_rows(walk_wsdf, B, S, G))
        sorted_rows = jax.lax.sort(tuple(row_ops), num_keys=1, dimension=1)
        rows = sorted_rows[0]
        n_valid = jnp.sum(jnp.where(walk_ids < base.sentinel, 1, 0))
        rows_c = rows[:, :base.group_cap]
        n_kept = jnp.sum(jnp.where(rows_c < base.sentinel, 1, 0))
        compaction_dropped = (n_valid - n_kept).astype(jnp.int32)
        walk_ids = rows_c.reshape(-1)
        j = 1
        if cfg.per_visit:
            ridx = sorted_rows[j][:, :base.group_cap].reshape(-1)
            j += 1
        if not uniform_w:
            walk_w = sorted_rows[j][:, :base.group_cap].reshape(-1)
            j += 1
        else:
            walk_w = (walk_ids != base.sentinel).astype(jnp.float32)
        walk_wsdf = sorted_rows[j][:, :base.group_cap].reshape(-1)

    end_ridx = row_order
    ids = jnp.concatenate([walk_ids, end_flat_masked])
    w_all = jnp.concatenate([walk_w, w_e])
    wsdf_all = jnp.concatenate([walk_wsdf, w_e * sdf_e])

    if cfg.per_visit:
        ridx_all = jnp.concatenate([ridx, end_ridx])
        if uniform_w:
            ids_s, _, wsdf_s = jax.lax.sort((ids, ridx_all, wsdf_all), num_keys=2)
            w_s = (ids_s != base.sentinel).astype(jnp.float32)
        else:
            ids_s, _, w_s, wsdf_s = jax.lax.sort(
                (ids, ridx_all, w_all, wsdf_all), num_keys=2)
        # Only the segment-last mask is needed per-visit (the running sums
        # come from blocked prefix scans below); skip _segment_reduce's
        # associative_scan entirely rather than leaning on XLA DCE.
        last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
        w_sum = wsdf_sum = None
    else:
        if uniform_w:
            ids_s, wsdf_s = jax.lax.sort((ids, wsdf_all), num_keys=1)
            w_s = (ids_s != base.sentinel).astype(jnp.float32)
        else:
            ids_s, w_s, wsdf_s = jax.lax.sort((ids, w_all, wsdf_all), num_keys=1)
        # Segment totals via blocked prefix sums (~0.33 ns/elem) instead of
        # _segment_reduce's associative_scan (~5.5 ns/elem on this
        # toolchain; ops/blocked.py).  segment_sums requires NON-NEGATIVE
        # values, so the signed w*sdf stream splits into its positive and
        # negative parts (error stays segment-local in each part; along a
        # ray sdf is almost entirely one-signed, so no cancellation blowup).
        from ohm_tpu.ops import blocked as _blocked

        first_b = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
        last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
        w_sum = _blocked.segment_sums(w_s, first_b)
        wsdf_sum = (_blocked.segment_sums(jnp.maximum(wsdf_s, 0.0), first_b)
                    - _blocked.segment_sums(jnp.maximum(-wsdf_s, 0.0), first_b))

    n_rec = ids_s.shape[0]
    cap = base.scatter_cap if 0 < base.scatter_cap < n_rec else 0
    big = jnp.int32(2**31 - 2)
    dropped = jnp.int32(0)

    def compact_deposit(mask, payloads):
        """Scatter per-voxel payloads from a sorted stream.

        With a scatter window (cap) the voxel rows selected by ``mask`` are
        pulled to the stream front by a payload-carrying sort and only the
        window scatters (sorted + unique + in-bounds — the fast lowering);
        the full-stream unique-scatter fallback mirrors the occupancy
        deposit (ops.integrate._apply_occupancy_dense).  Returns
        (pend arrays..., dropped)."""
        shape = arena["tsdf_weight"].shape
        if cap:
            key = jnp.where(mask, ids_s, big)
            ops = jax.lax.sort((key,) + tuple(payloads), num_keys=1)
            kc = ops[0][:cap]
            real = kc != big
            drop = (jnp.sum(mask.astype(jnp.int32))
                    - jnp.sum(real.astype(jnp.int32)))
            cpos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
            tgt = jnp.where(real, kc, base.pad_base + cpos)
            pends = tuple(
                jnp.zeros(shape, p.dtype).at[tgt].set(
                    jnp.where(real, o[:cap], jnp.zeros((), p.dtype)),
                    indices_are_sorted=True, unique_indices=True,
                    mode="promise_in_bounds")
                for p, o in zip(payloads, ops[1:]))
            return pends, drop
        idx = _unique_scatter_indices(ids_s, mask, base)
        pends = tuple(
            jnp.zeros(shape, p.dtype).at[idx].set(
                jnp.where(mask, p, jnp.zeros((), p.dtype)), unique_indices=True)
            for p in payloads)
        return pends, jnp.int32(0)

    arena = dict(arena)
    if cfg.per_visit:
        # PER-VISIT parity (reference ohm/VoxelTsdfCompute.h:87-137 applies
        # calculateTsdf — blend, truncate, weight-clamp — at every visit;
        # round-2 truncated once per batch, VERDICT item 6).  Each visit is
        # the monotone affine+clamp map
        #   d -> clamp((d*wc + sdf_j*u_j) / (wc + u_j), -trunc, +trunc)
        # where wc is the running CLAMPED weight before the visit.  The
        # clamped weight recursion telescopes (min(min(x,W)+u, W) ==
        # min(x+u, W) for u >= 0), so wc_prev = min(w0 + S_{j-1}, W) in
        # closed form from a blocked segment prefix sum, and the whole
        # segment folds into one composed (A, B, LO, HI) map
        # (ops.blocked.segment_compose_affine_clamp) — exact per-visit
        # semantics INCLUDING mid-batch max_weight saturation (round 4;
        # closes the round-3 "per-batch weight clamp" divergence).  Residual
        # slack: a near-zero-weight visit (reference :127 skips it) still
        # contributes its sub-1e-5 update weight to the running sum — below
        # f32 noise at any realistic weight.
        from ohm_tpu.ops import blocked

        first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
        real_seg = ids_s != base.sentinel
        from ohm_tpu.ops import deposit_pallas
        use_pallas = (base.pallas_deposit and deposit_pallas.deposit_ok(base))
        if use_pallas:
            # MXU gather kernel over the already-sorted id stream: the
            # batch-start (w0, d0) pair lands EXACTLY at EVERY record (one
            # nonzero one-hot product each), replacing both the compacted
            # seed window (sort + windowed gather + 3 scatters) and the
            # full-stream row gather (17.9 ms/batch, docs/PERF.md).  No
            # window: nothing seed-drops.
            w0_s, d0_s = deposit_pallas.gather_planes_f32(
                (arena["tsdf_weight"], arena["tsdf_distance"]), ids_s, base,
                interpret=base.pallas_deposit == 2)
            seeded = jnp.ones_like(first)
        elif cap:
            # Compacted seed fetch: the batch-start (w0, d0) of each touched
            # voxel is needed at every record, but a full-stream gather from
            # the multi-hundred-MB arena runs ~25 ns/element (latency-bound;
            # ~60 ms/batch at 1.2M records — the round-3 TSDF regression).
            # Instead: compact the segment-FIRST stream positions (1-operand
            # sort), gather the (w0, d0) pairs only for those <=cap rows,
            # scatter them back to the first positions, and propagate along
            # each segment with a blocked prefix sum (seeds live only at
            # firsts, so the segment prefix sum IS the broadcast).
            pos = jax.lax.broadcasted_iota(jnp.int32, (n_rec, 1), 0).squeeze(-1)
            fpos = jnp.where(first & real_seg, pos, big)
            fpos_all = jax.lax.sort((fpos,), num_keys=1)[0][:cap + 1]
            fpos_c = fpos_all[:cap]
            freal = fpos_c != big
            safe_pos = jnp.where(freal, fpos_c, 0)
            fids = ids_s[safe_pos]
            wd = jnp.stack([arena["tsdf_weight"], arena["tsdf_distance"]], axis=-1)
            seed = wd[jnp.where(freal, fids, 0)]
            seed_w = jnp.where(freal, seed[:, 0], 0.0)
            seed_d = jnp.where(freal, seed[:, 1], 0.0)
            tgt = jnp.where(freal, safe_pos, n_rec)
            w0_stream = jnp.zeros(n_rec + 1, jnp.float32).at[tgt].set(
                seed_w, indices_are_sorted=True, unique_indices=True,
                mode="drop")[:n_rec]
            # w0 >= 0 always, so the segment prefix sum (seeds live only at
            # firsts) IS the broadcast — blocked.segment_sums requires
            # NON-NEGATIVE values (its base propagation is a cummax).
            w0_s = blocked.segment_sums(w0_stream, first)
            # d0 can be NEGATIVE (stored distance sign), which the cummax
            # base propagation corrupts — but it is only consumed at segment
            # LASTS (d_k below), so scatter it AT the last positions instead
            # of broadcasting.  Sorted segment structure gives the lasts for
            # free: last_k = first_{k+1} - 1, and the final real segment
            # ends at total_real - 1 (sentinels sort to the stream tail).
            # next_f[cap-1] = fpos_all[cap]: when the window truncated, the
            # first DROPPED segment's first bounds the last kept segment.
            total_real = jnp.sum(real_seg.astype(jnp.int32))
            next_f = fpos_all[1:]
            lpos_c = jnp.where(freal,
                               jnp.where(next_f != big, next_f - 1, total_real - 1),
                               big)
            ltgt = jnp.where(freal, lpos_c, n_rec)
            d0_s = jnp.zeros(n_rec + 1, jnp.float32).at[ltgt].set(
                seed_d, indices_are_sorted=True, unique_indices=True,
                mode="drop")[:n_rec]
            # A segment whose seed missed the window must DROP its update
            # (counted), not run from a zero seed; 'seeded' is also read
            # only at lasts, so it rides the same last-position scatter.
            seeded = jnp.zeros(n_rec + 1, jnp.bool_).at[ltgt].set(
                freal, indices_are_sorted=True, unique_indices=True,
                mode="drop")[:n_rec]
            seed_dropped = (jnp.sum((first & real_seg).astype(jnp.int32))
                            - jnp.sum(freal.astype(jnp.int32)))
            dropped = dropped + seed_dropped
        else:
            # One stacked pair gather, not two plane gathers: gathers are
            # row-latency-bound (~15 ns/row at 1.19M records), so fetching
            # (w0, d0) as one [n_rec, 2] row gather halves the dominant cost
            # of the uncapped seed path (37 -> 18 ms measured,
            # scripts/probe_tsdf3.py gfull2 vs gfullp).
            wd = jnp.stack([arena["tsdf_weight"], arena["tsdf_distance"]],
                           axis=-1)
            seed = wd[ids_s]
            w0_s = seed[:, 0]
            d0_s = seed[:, 1]
            seeded = jnp.ones_like(first)
        s_w = blocked.segment_sums(w_s, first)
        w_run = w0_s + s_w
        # Running clamped weight BEFORE each visit (exclusive prefix).
        wc_prev = jnp.minimum(w_run - w_s, jnp.float32(cfg.max_weight))
        new_w_vis = wc_prev + w_s
        # Reference :127 skips a visit whose new weight is near zero; a
        # skipped visit is the identity map.
        alive_vis = new_w_vis >= jnp.float32(1e-5)
        fbig = jnp.float32(3.0e38)
        denom = jnp.where(alive_vis, new_w_vis, 1.0)
        a_map = jnp.where(alive_vis, wc_prev / denom, 1.0)
        b_map = jnp.where(alive_vis, wsdf_s / denom, 0.0)
        lo_map = jnp.where(alive_vis, -trunc, -fbig)
        hi_map = jnp.where(alive_vis, trunc, fbig)
        A, Bm, LO, HI = blocked.segment_compose_affine_clamp(
            a_map, b_map, lo_map, hi_map, first)
        d_k = jnp.minimum(jnp.maximum(A * d0_s + Bm, LO), HI)
        alive = w_run >= jnp.float32(1e-5)
        # Stored weight: the per-visit clamp telescopes to one final min.
        w_k = jnp.minimum(w_run, jnp.float32(cfg.max_weight))
        upd = last & alive & real_seg & seeded
        if use_pallas:
            # Pair SET-deposit kernel: the voxel-last (w_k, d_k) payloads
            # land through two f32 payload matmuls with the keep/replace
            # select fused per slot plane — replaces the compacted sort +
            # two windowed scatters (~3.7 ms each, docs/PERF.md).
            wv = jnp.where(upd, w_k, 0.0)
            dv = jnp.where(upd, d_k, 0.0)
            arena["tsdf_weight"], arena["tsdf_distance"] = (
                deposit_pallas.tsdf_set_deposit(
                    arena["tsdf_weight"], arena["tsdf_distance"], ids_s,
                    wv, dv, base, interpret=base.pallas_deposit == 2))
        else:
            (pend_w, pend_d), drop2 = compact_deposit(upd, (w_k, d_k))
            dropped = dropped + drop2
            pend_t = pend_w > 0  # w_k >= 1e-5 whenever upd
            arena["tsdf_weight"] = jnp.where(pend_t, pend_w, arena["tsdf_weight"])
            arena["tsdf_distance"] = jnp.where(pend_t, pend_d, arena["tsdf_distance"])
    else:
        # Batch blend: one accumulate + one truncation per batch (faster;
        # diverges from per-visit truncation on voxels whose record sdfs
        # straddle the truncation band).
        (pending_w, pending_wsdf), drop2 = compact_deposit(
            last & (ids_s != base.sentinel), (w_sum, wsdf_sum))
        dropped = dropped + drop2

        w0 = arena["tsdf_weight"]
        d0 = arena["tsdf_distance"]
        new_w = w0 + pending_w
        near_zero = jnp.abs(new_w) < jnp.float32(1e-5)
        new_d = jnp.where(near_zero, d0, (pending_wsdf + d0 * w0) / jnp.where(near_zero, 1.0, new_w))
        new_d = jnp.where(new_d > 0, jnp.minimum(trunc, new_d), jnp.maximum(-trunc, new_d))
        touched = pending_w != 0
        arena["tsdf_weight"] = jnp.where(touched & ~near_zero, jnp.minimum(new_w, jnp.float32(cfg.max_weight)), w0)
        arena["tsdf_distance"] = jnp.where(touched & ~near_zero, new_d, d0)

    stats = {
        "missed_updates": (walk_missed_n
                           + jnp.sum(jnp.where(end_active & end_missed, 1, 0))).astype(jnp.int32),
        "overflow": overflow_n,
        "touched": jnp.sum((last & (ids_s != base.sentinel)).astype(jnp.int32)),
        "compaction_dropped": compaction_dropped,
        "dropped_updates": dropped,
    }
    return arena, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))
def integrate_tsdf_jit(arena, batch, cfg: TsdfConfig):
    return integrate_tsdf(arena, batch, cfg)
