"""Fused DDA-expand kernel: rank walk + slot resolve -> flat keys (Pallas).

Replaces the expand phase's XLA chain (ops.ddawalk.walk_rays_unordered
followed by ops.integrate._resolve_slots) with ONE VPU kernel.  The XLA
chain materialises a dozen [B, 3S] HBM intermediates (~150 MB of traffic at
bench shapes: times/ranks/voxels[B,3S,3]/regions/locals/packed/key), while
the fused kernel holds everything per record in VMEM/registers and writes
ONLY the key plane (+ optional traversal payload) — the walk inputs are a
few dozen bytes per RAY.

Bit-exact contract: every float op replays the XLA path's op order
(times = e0 + k*dd, masked-int rank probes, descending-axis tie-break,
candidate equality select), so the emitted keys and traversal payloads are
bit-identical to the XLA composition — asserted record-for-record by
tests/test_expand_pallas.py (interpret mode) and the compiled on-chip
differential (OHM_TEST_TPU tier).

Reference analogue: the per-thread DDA walk + region lookup in
ohmgpu/gpu/LineWalk.cl (walkLineVoxels) and RegionUpdate.cl's region
resolution — same contract (visit records with reference tie-break
ordering, voxel -> region slot resolution), TPU-native mechanism
(closed-form rank walk over arithmetic event sequences, K-candidate
equality select, records in lanes).

Kernel-design rules honoured (docs/PERF.md round 5): records live in
LANES; per-ray scalars broadcast from (BR, 1) column slices; no gathers,
no scatters, no sorts — pure elementwise VPU work; the per-batch bbox
origin rides as a scalar-prefetch operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ohm_tpu.ops.ddawalk import _init_walk

# Rays per grid step (sublane dim of every block).
BR = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(gm_ref, fray_ref, iray_ref, *refs, S, K, shift, v, sentinel,
            exclude_origin, with_trav, with_vox):
    refs = list(refs)
    key_ref = refs.pop(0)
    trav_ref = refs.pop(0) if with_trav else None
    vox_refs = [refs.pop(0) for _ in range(3)] if with_vox else None
    (cnt_ref,) = refs

    dim_mask = (1 << shift) - 1
    # Record lane -> (axis, per-axis event index).  Lanes beyond 3S (width
    # padding to a multiple of 128) fall out as invalid: a == 2, k >= S.
    j = jax.lax.broadcasted_iota(jnp.int32, key_ref.shape, 1)
    a = (j >= S).astype(jnp.int32) + (j >= 2 * S).astype(jnp.int32)
    k = j - a * S

    def colf(c):
        return fray_ref[:, c:c + 1]

    def coli(c):
        return iray_ref[:, c:c + 1]

    def sel3(col):
        # Per-record select of the record's own-axis per-ray value.
        return jnp.where(a == 0, colf(col),
                         jnp.where(a == 1, colf(col + 1), colf(col + 2)))

    def sel3i(col):
        return jnp.where(a == 0, coli(col),
                         jnp.where(a == 1, coli(col + 1), coli(col + 2)))

    # fray columns: e0[3] dd[3] inv[3]; iray: start_abs[3] step_dir[3]
    # n_ax[3] tcand[K] exclude[1].
    e0r = sel3(0)
    ddr = sel3(3)
    n_axr = sel3i(6)
    kf = k.astype(jnp.float32)
    t = e0r + kf * ddr
    mt_a = jax.lax.bitcast_convert_type(t, jnp.int32) & ~3
    valid = k < n_axr

    # Per-axis exclusive event counts: own axis = k; other axes = rank of
    # this record's time in that axis's arithmetic event sequence
    # (ops.ddawalk.walk_rays_unordered.rank_against, op-for-op).
    counts = []
    prevs = []
    for bax in range(3):
        e0b = colf(bax)
        ddb = colf(3 + bax)
        invb = colf(6 + bax)
        nb = coli(6 + bax)
        est = jnp.floor((t - e0b) * invb).astype(jnp.int32)
        c = jnp.clip(est - 3, 0, nb)
        for step in (4, 2, 1):
            m = c + (step - 1)
            tm = e0b + m.astype(jnp.float32) * ddb
            mtm = jax.lax.bitcast_convert_type(tm, jnp.int32) & ~3
            adv = (m < nb) & (mtm < mt_a)
            c = c + jnp.where(adv, step, 0)
        # Descending-axis tie-break: a tied higher-axis event precedes.
        tc = e0b + c.astype(jnp.float32) * ddb
        mtc = jax.lax.bitcast_convert_type(tc, jnp.int32) & ~3
        c = c + ((a < bax) & (c < nb) & (mtc == mt_a)).astype(jnp.int32)
        cb = jnp.where(a == bax, k, c)
        counts.append(cb)
        if with_trav:
            prevs.append(jnp.where(
                cb > 0, e0b + (cb - 1).astype(jnp.float32) * ddb,
                jnp.float32(0)))

    # Slot resolution (ops.integrate._resolve_slots tcand branch).
    slot = jnp.full(key_ref.shape, jnp.int32(-1))
    packed = jnp.int32(0)
    in_box = True
    local_idx = jnp.int32(0)
    for bax in range(3):
        vox = coli(bax) + coli(3 + bax) * counts[bax]
        if with_vox:
            # Per-record absolute voxel coords, one i32 plane per axis —
            # exact by construction (same integers the slot resolution
            # consumes).  Meaningful wherever the emitted key is meaningful;
            # invalid/padding lanes carry don't-care values that callers
            # mask exactly as the XLA chain's walk["voxels"] tail does.
            vox_refs[bax][...] = vox
        region = vox >> shift
        rel = region - gm_ref[bax]
        packed = packed | (rel << (6 * bax))
        in_box = in_box & (rel >= 0) & (rel < 64)
        local_idx = local_idx | ((vox & dim_mask) << (shift * bax))
    packed = jnp.where(in_box, packed, jnp.int32(-1))
    for kk in range(K):
        cand = coli(9 + kk)
        cand_slot = (cand >> 18) - 1
        match = ((cand & 0x3FFFF) == packed) & (cand_slot >= 0)
        slot = jnp.where(match, cand_slot, slot)
    missed = slot < 0
    flat = jnp.where(missed, sentinel, slot * v + local_idx)

    if exclude_origin:
        first = (valid & (counts[0] == 0) & (counts[1] == 0)
                 & (counts[2] == 0))
        excl = coli(9 + K) != 0
        valid = valid & ~(first & excl)

    key_ref[...] = jnp.where(valid, flat, sentinel)

    if with_trav:
        # enters = max over axes of the previous event time, replaying the
        # XLA path's max order (own axis first, then ascending others) so
        # +-0.0 max selection is bit-identical.
        e_a0 = jnp.maximum(jnp.maximum(prevs[0], prevs[1]), prevs[2])
        e_a1 = jnp.maximum(jnp.maximum(prevs[1], prevs[0]), prevs[2])
        e_a2 = jnp.maximum(jnp.maximum(prevs[2], prevs[0]), prevs[1])
        enter = jnp.where(a == 0, e_a0, jnp.where(a == 1, e_a1, e_a2))
        trav_ref[...] = jnp.where(valid, t - enter, jnp.float32(0))

    # Missed-update stat: accumulated in one constant-index block that stays
    # VMEM-resident across the (sequential) grid and flushes once.
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _zero():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    miss_n = jnp.sum((valid & missed).astype(jnp.int32))
    zr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    cnt_ref[...] += jnp.where((zr == 0) & (zc == 0), miss_n, 0)


def expand_eligible(cfg, b) -> bool:
    """Kernel applicability: rayflow candidate wire + rank walk + grouping."""
    return bool(cfg.unordered_walk and cfg.group_cap and cfg.table_k
                and b.get("tcand") is not None and b.get("gmeta") is not None)


def expand_keys(b, cfg, exclude_origin: bool = False, with_trav: bool = False,
                with_vox: bool = False, interpret: bool = False):
    """Fused walk+resolve: unpacked rayflow batch -> per-record flat keys.

    Returns (flat i32[B, 3S] sentinel-masked record keys,
             trav f32[B, 3S] or None,
             aux dict: missed_n (i32 scalar), overflow (bool[B]),
             end_enter (f32[B]), and with_vox: vox i32[B, 3S, 3] absolute
             per-record voxel coords (don't-care on invalid/sentinel lanes,
             exactly like walk_rays_unordered's tail values)).

    flat/trav are bit-identical to walk_rays_unordered + _resolve_slots +
    the rec_valid/EXCLUDE_ORIGIN masking of ops.integrate.expand_records;
    vox matches walk["voxels"] bit-for-bit on every lane whose key is
    non-sentinel (NDT/TSDF consume it only there).
    """
    S = cfg.max_steps
    K = cfg.table_k
    start_abs = b["start_abs"]
    B = start_abs.shape[0]
    sign, e0, dd, crossings = _init_walk(
        b["start_frac"], b["direction"], b["length"],
        start_abs, b["end_abs"], cfg.resolution)
    step_dir = jnp.where(sign, -1, 1).astype(jnp.int32)
    n_ax = jnp.minimum(crossings, S)
    # Fold ray validity into the per-axis event counts: an invalid ray emits
    # no valid records (rec_valid would mask them anyway).
    n_ax = jnp.where(b["valid"][:, None], n_ax, 0)
    inv = jnp.where(dd > 0, 1.0 / jnp.where(dd > 0, dd, 1.0), 0.0)

    fray = jnp.concatenate([e0, dd, inv], axis=1)
    iray = jnp.concatenate(
        [start_abs, step_dir, n_ax, b["tcand"],
         b["exclude_start"].astype(jnp.int32)[:, None]], axis=1)

    # Closed-form aux quantities (per ray, XLA-side):
    overflow = jnp.any(crossings > S, axis=1)
    last_t = jnp.where(n_ax > 0,
                       e0 + (n_ax - 1).astype(jnp.float32) * dd,
                       jnp.float32(0))
    end_enter = jnp.maximum(jnp.maximum(
        jnp.maximum(last_t[:, 0], last_t[:, 1]), last_t[:, 2]),
        jnp.float32(0))

    Bp = _round_up(B, BR)
    if Bp != B:
        fray = jnp.concatenate(
            [fray, jnp.zeros((Bp - B, fray.shape[1]), fray.dtype)])
        iray = jnp.concatenate(
            [iray, jnp.zeros((Bp - B, iray.shape[1]), iray.dtype)])
    W = _round_up(3 * S, 128)

    kern = functools.partial(
        _kernel, S=S, K=K, shift=cfg.region_shift,
        v=cfg.voxels_per_region, sentinel=cfg.sentinel,
        exclude_origin=exclude_origin, with_trav=with_trav,
        with_vox=with_vox)

    out_shape = [jax.ShapeDtypeStruct((Bp, W), jnp.int32)]
    out_specs = [pl.BlockSpec((BR, W), lambda r, *_: (r, 0),
                              memory_space=pltpu.VMEM)]
    if with_trav:
        out_shape.append(jax.ShapeDtypeStruct((Bp, W), jnp.float32))
        out_specs.append(pl.BlockSpec((BR, W), lambda r, *_: (r, 0),
                                      memory_space=pltpu.VMEM))
    if with_vox:
        for _ in range(3):
            out_shape.append(jax.ShapeDtypeStruct((Bp, W), jnp.int32))
            out_specs.append(pl.BlockSpec((BR, W), lambda r, *_: (r, 0),
                                          memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.int32))
    out_specs.append(pl.BlockSpec((8, 128), lambda r, *_: (0, 0),
                                  memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // BR,),
        in_specs=[
            pl.BlockSpec((BR, fray.shape[1]), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, iray.shape[1]), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(b["gmeta"][0:3], fray, iray)

    flat = outs[0][:B, :3 * S]
    j = 1
    trav = None
    if with_trav:
        trav = outs[j][:B, :3 * S]
        j += 1
    aux = {"missed_n": outs[-1][0, 0], "overflow": overflow,
           "end_enter": end_enter}
    if with_vox:
        aux["vox"] = jnp.stack([outs[j + c][:B, :3 * S] for c in range(3)],
                               axis=-1)
    return flat, trav, aux
