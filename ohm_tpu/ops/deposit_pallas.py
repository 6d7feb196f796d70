"""MXU one-hot matmul deposit + fused sweeps (Pallas/Mosaic).

Replaces the apply phase's unique scatter + dense sweep (the single most
expensive device stage: ~7.1 ms of the 16.8 ms budget at bench shapes,
docs/PERF.md) with a slot-grid Pallas kernel that turns the scatter into
matrix multiplication:

  - grid over arena region slots; per slot, loop the slot's chunk range of
    the SORTED (flat << 1 | hit) key stream (chunk-aligned; boundary chunks
    are processed by both neighbours with complementary masks),
  - per 512-record chunk, build two int8 one-hot factors with records IN
    LANES (Mosaic rejects the records-in-sublanes reshape: "infer-vector-
    layout: unsupported shape cast", scripts/probe_deposit.py round-4 log)
    and deposit via ONE MXU matmul contracting over the lane dim
    (A[2*HI, 512] . B[LO, 512]^T -> [2*HI, LO] hit/miss count planes),
  - run the FULL sweep for the mapper family on the slot's plane in the
    same kernel, reading batch-start state exactly like the dense sweeps
    it replaces (ops.integrate._occupancy_sweep; integrate_ndt's NDT
    apply, which adds a per-voxel miss-delta plane).

Bit-exactness: counts are exact integers (int8 one-hots, int32 matmul
accumulation, f32 accumulate across chunks — all < 2^24), capped at 65535
to match the packed-u16 deposit, and the sweeps replay the dense sweeps'
f32 op order — the probe measures 0 bit mismatches against the scatter
path over a 1.25M-record stream (scripts/probe_deposit.py).

Measured: 2.8 ms vs 9.2 ms for scatter + sweep on the same stream
(v5e, 1.25 M records, 512-slot arena, 320 live slots); bench device time
14.23 -> 8.33 ms/batch.

Reference analogue: the per-voxel CAS deposit loops in
ohmgpu/gpu/RegionUpdate.cl:403-470 and ohmgpu/gpu/NdtMap-family kernels —
same contract (per-voxel batch accumulation against batch-start state),
TPU-native mechanism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ohm_tpu.core.rayflags import RayFlag

LO = 512          # lane width of the count/occupancy planes
CHUNK = 512       # records per MXU deposit chunk (sweep optimum, probe r5)
_ROWS = CHUNK // 128


def deposit_ok(cfg) -> bool:
    """Kernel applicability: plane factorisation needs V % LO == 0."""
    v = cfg.voxels_per_region
    return v >= LO and v % LO == 0


def _sweep_block(initial, hit_cnt, miss_cnt, cfg):
    """The occupancy sweep on one slot plane — must mirror
    ops.integrate._occupancy_sweep op-for-op (f32 bit parity)."""
    flags = cfg.ray_flags
    capf = jnp.float32(65535.0)
    n_hit_d = jnp.minimum(hit_cnt, capf)
    n_miss_d = jnp.minimum(miss_cnt, capf)

    if cfg.zero_unobserved:
        unobs = (initial == 0) & jnp.signbit(initial)
    else:
        unobs = jnp.isposinf(initial)
    zero = jnp.float32(0)
    hit_eff = jnp.full_like(initial, jnp.float32(cfg.hit_value))
    miss_eff = jnp.full_like(initial, jnp.float32(cfg.miss_value))
    if flags & RayFlag.EXCLUDE_FREE:
        free = ~unobs & (initial < cfg.occupancy_threshold)
        hit_eff = jnp.where(free, zero, hit_eff)
        miss_eff = jnp.where(free, zero, miss_eff)
    if flags & RayFlag.EXCLUDE_OCCUPIED:
        occd = ~unobs & (initial >= cfg.occupancy_threshold)
        hit_eff = jnp.where(occd, zero, hit_eff)
        miss_eff = jnp.where(occd, zero, miss_eff)

    total = n_hit_d * hit_eff + n_miss_d * miss_eff
    base = jnp.where(unobs, zero, initial)
    value = base + total
    value = jnp.where(total > 0, jnp.minimum(value, jnp.float32(cfg.max_value)), value)
    value = jnp.where(total < 0, jnp.maximum(value, jnp.float32(cfg.min_value)), value)

    touched = (hit_cnt + miss_cnt) > 0
    keep = ~touched
    if cfg.saturation_min > float("-inf") or cfg.saturation_max < float("inf"):
        saturated = ~unobs & ((initial <= jnp.float32(cfg.saturation_min))
                              | (initial >= jnp.float32(cfg.saturation_max)))
        keep = keep | saturated
    if flags & RayFlag.EXCLUDE_UNOBSERVED:
        keep = keep | unobs
    return jnp.where(keep, initial, value)


def _ndt_sweep_block(initial, hit_cnt, miss_cnt, delta, cfg):
    """NDT occupancy apply on one slot plane — mirrors integrate_ndt's dense
    apply op-for-op (no kRfExclude* matrix, miss-delta plane added, +inf
    unobserved encoding, saturation respected;
    ohm/RayMapperNdt.cpp:214-215,349-351)."""
    capf = jnp.float32(65535.0)
    n_hit_d = jnp.minimum(hit_cnt, capf)
    n_miss_d = jnp.minimum(miss_cnt, capf)
    unobs = jnp.isposinf(initial)
    total = (n_hit_d * jnp.float32(cfg.hit_value)
             + n_miss_d * jnp.float32(cfg.miss_value)
             + delta)
    base_val = jnp.where(unobs, 0.0, initial)
    value = base_val + total
    value = jnp.where(total > 0, jnp.minimum(value, jnp.float32(cfg.max_value)), value)
    value = jnp.where(total < 0, jnp.maximum(value, jnp.float32(cfg.min_value)), value)
    touched = ((hit_cnt + miss_cnt) > 0) | (delta != 0)
    saturated = ~unobs & (
        (initial <= jnp.float32(cfg.saturation_min))
        | (initial >= jnp.float32(cfg.saturation_max)))
    keep = ~touched | saturated
    return jnp.where(keep, initial, value)


def _deposit_core(occupancy, key_sorted, cfg, sweep_fn, extra_planes=(),
                  interpret: bool = False, bounds_key=None, key2_sorted=None,
                  delta_stream=None):
    """Shared kernel: per-slot count deposit + fused per-slot sweep.

    occupancy: f32[T] flat arena (T % LO == 0 — VoxelArena rounds up).
    key_sorted: i32[N] ascending (flat << 1 | hit); sentinel records fall
        outside every slot range and are ignored.
    sweep_fn(initial, hit_cnt, miss_cnt, *extras) -> swept plane; runs on
        EVERY slot (zero counts on slots without records — extras may still
        demand a sweep there, e.g. the NDT miss-delta plane).
    extra_planes: flat f32[T] arrays blocked per slot like occupancy.
    bounds_key: optional i32[N] ascending stream from which stream-1 chunk
        bounds are computed instead of key_sorted — lets the caller MASK
        entries of key_sorted to sentinel (breaking global sortedness) as
        long as the unmasked ordering is preserved: the bounds cover every
        unmasked position and the in-slot test ignores masked records.
    key2_sorted: optional second ascending (flat << 1 | hit) stream (e.g.
        sample/end records) deposited into the same count planes before the
        sweep — counts must merge before the nonlinear sweep math.
    delta_stream: optional (keys, vals) sparse f32 per-voxel delta — keys
        i32[Nd] ascending (flat << 1) with sentinel padding, vals f32[Nd]
        nonzero at AT MOST ONE record per voxel (exact one-hot payload
        deposit: u8x4 byte-plane bf16 matmuls, int32 recombination — see
        gather_planes_f32).  The sweep receives the per-slot delta plane as
        its first extra argument — replacing an arena-shaped
        zeros().at[].set() dense scatter (~1.3 ms/batch at bench shapes)
        with a few payload chunks.

    Returns (occupancy', touched) where touched is the distinct-voxel count
    of the stream(s).  Nothing is ever dropped (no scatter_cap in this path).
    """
    cap = cfg.capacity
    v = cfg.voxels_per_region
    hi = v // LO
    t = occupancy.shape[0]
    if t % LO:
        raise ValueError(f"arena length {t} not a multiple of {LO}")
    sent_key = jnp.int32((cfg.sentinel << 1) | 1)

    def _pad_and_bounds(keys, bkeys):
        pad = (-keys.shape[0]) % CHUNK
        if pad:
            # Sentinel keys are the stream maximum: appending keeps order.
            keys = jnp.concatenate([keys, jnp.full((pad,), sent_key, jnp.int32)])
            bkeys = jnp.concatenate([bkeys, jnp.full((pad,), sent_key, jnp.int32)])
        bounds = jnp.searchsorted(
            bkeys >> 1, jnp.arange(cap + 1, dtype=jnp.int32) * v).astype(jnp.int32)
        return (keys.reshape(-1, 128), bounds[:-1] // CHUNK,
                (bounds[1:] + CHUNK - 1) // CHUNK)

    keys2d, c0, c1 = _pad_and_bounds(
        key_sorted, key_sorted if bounds_key is None else bounds_key)
    streams = [keys2d]
    if key2_sorted is not None:
        keys2d_b, c0b, c1b = _pad_and_bounds(key2_sorted, key2_sorted)
        streams.append(keys2d_b)
        c0 = jnp.concatenate([c0, c0b])
        c1 = jnp.concatenate([c1, c1b])
    n_streams = len(streams)

    dkeys2d = dvals2d = None
    if delta_stream is not None:
        dkeys, dvals = delta_stream
        padd = (-dkeys.shape[0]) % CHUNK
        if padd:
            dkeys = jnp.concatenate(
                [dkeys, jnp.full((padd,), sent_key, jnp.int32)])
            dvals = jnp.concatenate(
                [dvals, jnp.zeros((padd,), jnp.float32)])
        dbounds = jnp.searchsorted(
            dkeys >> 1, jnp.arange(cap + 1, dtype=jnp.int32) * v
        ).astype(jnp.int32)
        dkeys2d = dkeys.reshape(-1, 128)
        dvals2d = dvals.reshape(-1, 128)
        c0 = jnp.concatenate([c0, dbounds[:-1] // CHUNK])
        c1 = jnp.concatenate([c1, (dbounds[1:] + CHUNK - 1) // CHUNK])

    occ2d = occupancy.reshape(t // LO, LO)
    extras2d = [p.reshape(t // LO, LO) for p in extra_planes]
    n_extra = len(extras2d)
    n_bound_streams = n_streams + (1 if delta_stream is not None else 0)
    # Dead-slot elision: most arena slots carry no records for a given batch
    # (bench: ~320 live of 1024), and a fixed (hi, LO) block swap per slot
    # dominated the kernel at large capacities (7.4 ms vs 2.8 at bench
    # shapes).  The block index maps are data-dependent: dead slots map to
    # ONE dummy block in the scratch-tail rows, which Pallas's revisit
    # elision fetches/flushes once per dead RUN instead of once per slot.
    # The dummy block is written back unchanged (passthrough), so the
    # sentinel element + scratch tail it covers stay intact.
    if t // LO < (cap + 1) * hi:
        raise ValueError("arena tail too small for the dummy deposit block")

    def _live(s, c0_ref, c1_ref):
        l = c1_ref[s] > c0_ref[s]
        for si in range(1, n_bound_streams):
            l = l | (c1_ref[si * cap + s] > c0_ref[si * cap + s])
        return l

    def _block_ix(s, c0_ref, c1_ref):
        return (jnp.where(_live(s, c0_ref, c1_ref), s, cap), 0)

    has_delta = delta_stream is not None

    def kernel(c0_ref, c1_ref, *refs):
        keys_hbms = refs[:n_streams]
        i = n_streams
        if has_delta:
            dkeys_hbm, dvals_hbm = refs[i], refs[i + 1]
            i += 2
        occ_ref = refs[i]
        extra_refs = refs[i + 1:i + 1 + n_extra]
        rest = refs[i + 1 + n_extra:]
        if has_delta:
            (out_ref, cnt_ref, keyvm, accum,
             dkeyvm, dvalvm, accd, sem, dsem) = rest
        else:
            out_ref, cnt_ref, keyvm, accum, sem = rest
        s = pl.program_id(0)
        base = jnp.int32(s) * v
        live = _live(s, c0_ref, c1_ref)

        # The touched-count output block has a CONSTANT index: it stays
        # resident in VMEM across the whole (sequential) grid and flushes
        # once at the end — a per-slot-indexed count plane cost ~1024 tiny
        # DMA flushes per call.
        @pl.when(s == 0)
        def _zero_counts():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        @pl.when(live)
        def _live_step():
            accum[...] = jnp.zeros_like(accum)
            ihc = jax.lax.broadcasted_iota(jnp.int32, (2 * hi, CHUNK), 0)
            ilc = jax.lax.broadcasted_iota(jnp.int32, (LO, CHUNK), 0)

            for si in range(n_streams):
                lo0 = c0_ref[si * cap + s]
                hi1 = c1_ref[si * cap + s]
                keys_hbm = keys_hbms[si]

                def get_dma(slot, c, keys_hbm=keys_hbm):
                    return pltpu.make_async_copy(
                        keys_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                        keyvm.at[slot], sem.at[slot])

                @pl.when(hi1 > lo0)
                def _deposit(lo0=lo0, hi1=hi1, get_dma=get_dma):
                    get_dma(lo0 & 1, lo0).start()

                    def body(c, _):
                        slot = c & 1

                        @pl.when(c + 1 < hi1)
                        def _prefetch():
                            get_dma((c + 1) & 1, c + 1).start()

                        get_dma(slot, c).wait()
                        # Lane-concatenate the chunk's rows into one
                        # (1, CHUNK) record row; both one-hot factors build
                        # in one shot and ONE k=CHUNK int8 MXU matmul
                        # deposits the whole chunk.
                        k = jnp.concatenate(
                            [keyvm[slot, r:r + 1, :] for r in range(_ROWS)],
                            axis=1)
                        flat = k >> 1
                        hit = k & 1
                        in_slot = (flat >= base) & (flat < base + v)
                        vloc = flat - base
                        lo_b = vloc & (LO - 1)
                        hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
                        # hit rows [0, hi), miss rows [hi, 2*hi) in one factor
                        w = jnp.where(ihc < hi, hit, 1 - hit)
                        oh_hi = jnp.where(((ihc % hi) == hi_b) & in_slot,
                                          w, 0).astype(jnp.int8)  # (2hi,CHUNK)
                        oh_lo = (ilc == lo_b).astype(jnp.int8)    # (LO,CHUNK)
                        accum[...] += jax.lax.dot_general(
                            oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32).astype(jnp.float32)
                        return _

                    jax.lax.fori_loop(lo0, hi1, body, 0, unroll=False)

            delta_blocks = []
            if has_delta:
                # Sparse per-voxel delta: u8x4 byte-plane payload matmuls
                # (at most one nonzero-valued record per voxel => each
                # output is a single product, exact for every f32 pattern;
                # see gather_planes_f32).
                accd[...] = jnp.zeros_like(accd)
                dlo = c0_ref[n_streams * cap + s]
                dhi = c1_ref[n_streams * cap + s]
                ihc2 = jax.lax.broadcasted_iota(jnp.int32, (hi, CHUNK), 0)

                def dget_dma(slot, c):
                    return [
                        pltpu.make_async_copy(
                            dkeys_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                            dkeyvm.at[slot], dsem.at[slot, 0]),
                        pltpu.make_async_copy(
                            dvals_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                            dvalvm.at[slot], dsem.at[slot, 1]),
                    ]

                @pl.when(dhi > dlo)
                def _delta_deposit():
                    for cp in dget_dma(dlo & 1, dlo):
                        cp.start()

                    def dbody(c, _):
                        slot = c & 1

                        @pl.when(c + 1 < dhi)
                        def _prefetch():
                            for cp in dget_dma((c + 1) & 1, c + 1):
                                cp.start()

                        for cp in dget_dma(slot, c):
                            cp.wait()
                        k = jnp.concatenate(
                            [dkeyvm[slot, r:r + 1, :] for r in range(_ROWS)],
                            axis=1)
                        dv = jnp.concatenate(
                            [dvalvm[slot, r:r + 1, :] for r in range(_ROWS)],
                            axis=1)
                        flat = k >> 1
                        in_slot = (flat >= base) & (flat < base + v)
                        vloc = flat - base
                        lo_b = vloc & (LO - 1)
                        hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
                        # Masks combine in f32 then convert (Mosaic rejects
                        # the i1 relayout into bf16 tiling).
                        match_f = ((ihc2 == hi_b) & in_slot).astype(jnp.float32)
                        oh_lo = (((ilc == lo_b) & in_slot).astype(jnp.float32)
                                 ).astype(jnp.bfloat16)
                        bits = jax.lax.bitcast_convert_type(dv, jnp.int32)
                        for byte in range(4):
                            piece = ((bits >> (8 * byte)) & 255
                                     ).astype(jnp.float32)
                            oh_d = (match_f * piece).astype(jnp.bfloat16)
                            accd[byte] += jax.lax.dot_general(
                                oh_d, oh_lo, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        return _

                    jax.lax.fori_loop(dlo, dhi, dbody, 0, unroll=False)

                dbits = jnp.zeros((hi, LO), jnp.int32)
                for byte in range(4):
                    dbits = dbits + (accd[byte].astype(jnp.int32) << (8 * byte))
                delta_blocks.append(
                    jax.lax.bitcast_convert_type(dbits, jnp.float32))

            swept = sweep_fn(occ_ref[...], accum[:hi], accum[hi:],
                             *delta_blocks, *[r[...] for r in extra_refs])
            out_ref[...] = swept
            # Touched-voxel count from the exact integer count planes
            # (works with masked/multi-stream inputs where a host-side key
            # diff would miscount).  Scalar VMEM stores don't lower, so the
            # count accumulates through a one-position mask of the resident
            # block.
            cnt = jnp.sum(((accum[:hi] + accum[hi:]) > 0).astype(jnp.int32))
            zr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            zc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            cnt_ref[...] += jnp.where((zr == 0) & (zc == 0), cnt, 0)

        @pl.when(~live)
        def _dead_step():
            # Dummy block passthrough (keeps the scratch-tail rows intact
            # on flush).
            out_ref[...] = occ_ref[...]

    block = pl.BlockSpec((hi, LO), _block_ix, memory_space=pltpu.VMEM)
    n_any = n_streams + (2 if has_delta else 0)
    scratch = [
        pltpu.VMEM((2, _ROWS, 128), jnp.int32),
        pltpu.VMEM((2 * hi, LO), jnp.float32),
    ]
    if has_delta:
        scratch += [
            pltpu.VMEM((2, _ROWS, 128), jnp.int32),    # delta keys
            pltpu.VMEM((2, _ROWS, 128), jnp.float32),  # delta vals
            pltpu.VMEM((4, hi, LO), jnp.float32),      # delta byte planes
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_delta:
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_any  # key/delta hbm
        + [block] * (1 + n_extra),                     # occ + extras
        out_specs=[block,
                   pl.BlockSpec((8, 128), lambda s, *_: (0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
    )
    operands = list(streams)
    if has_delta:
        operands += [dkeys2d, dvals2d]
    out2d, cnts = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(occ2d.shape, jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
        # operand order after scalar prefetch: key streams (+ delta key/val
        # streams), then occ2d.  Aliasing occ in->out makes the update
        # in-place under donation; grid blocks beyond slot `cap` (sentinel +
        # scratch tail rows) are never written and keep their contents
        # either way.
        input_output_aliases={2 + n_any: 0},
    )(c0, c1, *operands, occ2d, *extras2d)

    return out2d.reshape(-1), jnp.sum(cnts)


def deposit_and_sweep(occupancy, key_sorted, cfg, interpret: bool = False):
    """Occupancy-family deposit: replaces sorted_hit_miss_counts +
    _apply_occupancy_dense + _occupancy_sweep in ops.integrate.apply_records.
    Returns (occupancy', touched)."""
    return _deposit_core(
        occupancy, key_sorted, cfg,
        lambda initial, h, m: _sweep_block(initial, h, m, cfg),
        interpret=interpret)


def deposit_and_sweep_ndt(occupancy, key_sorted, delta, cfg,
                          interpret: bool = False, bounds_key=None,
                          key2_sorted=None):
    """NDT-family deposit: standard hit/miss counts from the (optionally
    masked — see _deposit_core bounds_key) walk key stream plus the sorted
    end/sample stream, plus the Gaussian miss-delta — EITHER a dense
    arena-shaped f32 plane (legacy / NDT-TM path) OR a sparse sorted
    (keys = flat << 1, vals) stream deposited in-kernel (u8x4 payload
    matmuls; replaces the dense zeros().at[].set() scatter).  The sweep
    runs on every slot with records in the UNMASKED bounds stream — a slot
    can carry deltas without std records because the Gaussian-handled walk
    records still occupy the bounds.  Returns (occupancy', touched_std)."""
    if isinstance(delta, tuple):
        return _deposit_core(
            occupancy, key_sorted, cfg,
            lambda initial, h, m, d: _ndt_sweep_block(initial, h, m, d, cfg),
            interpret=interpret, bounds_key=bounds_key,
            key2_sorted=key2_sorted, delta_stream=delta)
    return _deposit_core(
        occupancy, key_sorted, cfg,
        lambda initial, h, m, d: _ndt_sweep_block(initial, h, m, d, cfg),
        extra_planes=(delta,), interpret=interpret,
        bounds_key=bounds_key, key2_sorted=key2_sorted)


# Gather-kernel chunking: i32 VMEM blocks need >= 8 sublanes.
_GROWS = 8
GCHUNK = _GROWS * 128


def gather_plane(plane, flat_sorted, cfg, interpret: bool = False):
    """Per-record gather from an arena plane over a flat-SORTED id stream —
    the MXU/matmul replacement for XLA's latency-bound random gather
    (~11 ms per 1M records on this chip vs ~2 ms here).

    plane: int8[T] flat arena layer (T % LO == 0); values to gather.
    flat_sorted: i32[N] ascending flat voxel ids; sentinel/padding ids
        (>= cfg.sentinel) gather 0.

    Chunk-grid structure (records stay in stream order, so the output block
    mapping is static — no write collisions): per 1024-record chunk, loop the
    chunk's contiguous slot span (precomputed in XLA and scalar-prefetched);
    per slot, the gather is one int8 MXU matmul
    T1 = plane_slot[hi, LO] @ one_hot_lo[LO, GCHUNK] followed by a
    sublane-masked reduction against one_hot_hi.  A resident-slot cache in
    kernel scratch persists across sequential grid steps, so each live slot's
    plane is DMA'd ONCE per call (sorted stream => slot runs are contiguous).

    Returns i32[N].
    """
    v = cfg.voxels_per_region
    hi = v // LO
    vshift = (v - 1).bit_length()
    t = plane.shape[0]
    if t % LO:
        raise ValueError(f"plane length {t} not a multiple of {LO}")
    n = flat_sorted.shape[0]
    pad = (-n) % GCHUNK
    if pad:
        flat_sorted = jnp.concatenate(
            [flat_sorted, jnp.full((pad,), cfg.sentinel, jnp.int32)])
    keys2d = flat_sorted.reshape(-1, 128)
    n_rows = keys2d.shape[0]
    n_chunks = n_rows // _GROWS
    plane2d = plane.reshape(t // LO, LO)

    # Per-chunk slot spans from the chunk-boundary records (stream sorted):
    # s_first from the chunk's first id, s_last from its last REAL id (a
    # sentinel-only chunk yields an empty span).
    first_ids = flat_sorted[::GCHUNK]
    last_ids = flat_sorted[GCHUNK - 1::GCHUNK]
    # Last REAL id of the chunk: if the chunk tail is sentinel, the last real
    # id is <= the sentinel anyway and the extra slots in the span just mask
    # to zero — but an all-sentinel chunk must produce an empty span.
    s_first = jnp.where(first_ids < cfg.sentinel, first_ids >> vshift,
                        jnp.int32(1 << 30)).astype(jnp.int32)
    s_end = (jnp.minimum(last_ids, cfg.sentinel - 1) >> vshift) + 1
    s_end = jnp.maximum(s_end, jnp.where(first_ids < cfg.sentinel, 0,
                                         jnp.int32(-(1 << 30)))).astype(jnp.int32)

    def kernel(sf_ref, se_ref, keys_ref, plane_hbm, out_ref,
               planevm, resident, sem):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            resident[0] = -1

        k = jnp.concatenate(
            [keys_ref[r:r + 1, :] for r in range(_GROWS)], axis=1)  # (1,GCHUNK)
        real = k < cfg.sentinel

        acc0 = jnp.zeros((1, GCHUNK), jnp.int32)
        ihr = jax.lax.broadcasted_iota(jnp.int32, (hi, GCHUNK), 0)
        ilc = jax.lax.broadcasted_iota(jnp.int32, (LO, GCHUNK), 0)

        def body(s, acc):
            @pl.when(resident[0] != s)
            def _fetch():
                cp = pltpu.make_async_copy(
                    plane_hbm.at[pl.ds(s * hi, hi), :], planevm, sem)
                cp.start()
                cp.wait()
                resident[0] = s

            base = s * v
            in_slot = real & (k >= base) & (k < base + v)
            vloc = k - base
            lo_b = vloc & (LO - 1)
            hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
            oh_lo = jnp.where(in_slot, (ilc == lo_b).astype(jnp.int8),
                              jnp.int8(0))                      # (LO, GCHUNK)
            t1 = jax.lax.dot_general(
                planevm[...], oh_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)               # (hi, GCHUNK)
            oh_hi = ((ihr == hi_b) & in_slot).astype(jnp.int32)
            return acc + jnp.sum(t1 * oh_hi, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(sf_ref[step], se_ref[step], body, acc0,
                                unroll=False)
        for r in range(_GROWS):
            out_ref[r:r + 1, :] = acc[:, r * 128:(r + 1) * 128]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_GROWS, 128), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),     # keys chunk
            pl.BlockSpec(memory_space=pl.ANY),         # plane (HBM)
        ],
        out_specs=pl.BlockSpec((_GROWS, 128), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hi, LO), jnp.int8),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_first, s_end, keys2d, plane2d)

    return out.reshape(-1)[:n]


def gather_planes_f32(planes, flat_sorted, cfg, interpret: bool = False):
    """Multi-channel EXACT f32 gather over a flat-SORTED id stream.

    Same chunk-grid / resident-slot structure as gather_plane.  Exactness
    mechanism: the f32 plane splits into FOUR u8 byte planes (each exact in
    bf16), each gathers through a single-pass bf16 matmul (one nonzero
    product per output), and the bytes recombine in int32 — bit-exact for
    every f32 pattern including -0.0/inf/NaN.  A plain f32 dot is NOT
    usable: this Mosaic lowers it as single-pass bf16 (measured rel err
    2^-8 on chip) and the exact Precision.HIGHEST costs ~6 passes; the
    u8 split costs 4.  All channels share the one-hot factors.

    planes: tuple of f32[T] flat arena layers (T % LO == 0).
    flat_sorted: i32[N] ascending; ids >= cfg.sentinel gather 0.0.
    Returns tuple of f32[N].

    Replaces the per-visit TSDF seed pair gather (one [n_rec, 2] row gather
    = 17.9 ms/batch, docs/PERF.md round-4) at ~2 ms/channel-megarecord.
    """
    v = cfg.voxels_per_region
    hi = v // LO
    vshift = (v - 1).bit_length()
    n_ch = len(planes)
    t = planes[0].shape[0]
    if t % LO:
        raise ValueError(f"plane length {t} not a multiple of {LO}")
    n = flat_sorted.shape[0]
    pad = (-n) % GCHUNK
    if pad:
        flat_sorted = jnp.concatenate(
            [flat_sorted, jnp.full((pad,), cfg.sentinel, jnp.int32)])
    keys2d = flat_sorted.reshape(-1, 128)
    n_rows = keys2d.shape[0]
    n_chunks = n_rows // _GROWS
    planes2d = [p.reshape(t // LO, LO) for p in planes]

    first_ids = flat_sorted[::GCHUNK]
    last_ids = flat_sorted[GCHUNK - 1::GCHUNK]
    s_first = jnp.where(first_ids < cfg.sentinel, first_ids >> vshift,
                        jnp.int32(1 << 30)).astype(jnp.int32)
    s_end = (jnp.minimum(last_ids, cfg.sentinel - 1) >> vshift) + 1
    s_end = jnp.maximum(s_end, jnp.where(first_ids < cfg.sentinel, 0,
                                         jnp.int32(-(1 << 30)))).astype(jnp.int32)

    def kernel(sf_ref, se_ref, keys_ref, *refs):
        plane_hbms = refs[:n_ch]
        out_refs = refs[n_ch:2 * n_ch]
        planevm, resident, sem = refs[2 * n_ch:]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            resident[0] = -1

        k = jnp.concatenate(
            [keys_ref[r:r + 1, :] for r in range(_GROWS)], axis=1)  # (1,GCHUNK)
        real = k < cfg.sentinel

        acc0 = tuple(jnp.zeros((1, GCHUNK), jnp.int32) for _ in range(n_ch))
        ihr = jax.lax.broadcasted_iota(jnp.int32, (hi, GCHUNK), 0)
        ilc = jax.lax.broadcasted_iota(jnp.int32, (LO, GCHUNK), 0)

        def body(s, accs):
            @pl.when(resident[0] != s)
            def _fetch():
                for ch in range(n_ch):
                    cp = pltpu.make_async_copy(
                        plane_hbms[ch].at[pl.ds(s * hi, hi), :],
                        planevm.at[ch], sem)
                    cp.start()
                    cp.wait()
                resident[0] = s

            base = s * v
            in_slot = real & (k >= base) & (k < base + v)
            vloc = k - base
            lo_b = vloc & (LO - 1)
            hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
            oh_lo = jnp.where(in_slot, (ilc == lo_b).astype(jnp.bfloat16),
                              jnp.bfloat16(0))                  # (LO, GCHUNK)
            oh_hi = jnp.where((ihr == hi_b) & in_slot,
                              jnp.float32(1), jnp.float32(0))   # (hi, GCHUNK)
            outs = []
            for ch in range(n_ch):
                bits = jax.lax.bitcast_convert_type(planevm[ch], jnp.int32)
                acc_bits = accs[ch]
                for byte in range(4):
                    piece = ((bits >> (8 * byte)) & 255).astype(jnp.bfloat16)
                    t1 = jax.lax.dot_general(
                        piece, oh_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)     # (hi, GCHUNK)
                    val = jnp.sum(t1 * oh_hi, axis=0,
                                  keepdims=True).astype(jnp.int32)
                    acc_bits = acc_bits + (val << (8 * byte))
                outs.append(acc_bits)
            return tuple(outs)

        accs = jax.lax.fori_loop(sf_ref[step], se_ref[step], body, acc0,
                                 unroll=False)
        for ch in range(n_ch):
            f32_out = jax.lax.bitcast_convert_type(accs[ch], jnp.float32)
            for r in range(_GROWS):
                out_refs[ch][r:r + 1, :] = f32_out[:, r * 128:(r + 1) * 128]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((_GROWS, 128), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_ch,
        out_specs=[pl.BlockSpec((_GROWS, 128), lambda c, *_: (c, 0),
                                memory_space=pltpu.VMEM)] * n_ch,
        scratch_shapes=[
            pltpu.VMEM((n_ch, hi, LO), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_rows, 128), jnp.float32)] * n_ch,
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_first, s_end, keys2d, *planes2d)

    return tuple(o.reshape(-1)[:n] for o in outs)


def tsdf_set_deposit(weight_plane, dist_plane, flat_sorted, w_vals, d_vals,
                     cfg, interpret: bool = False):
    """TSDF pair deposit: per-voxel (weight, distance) SET at unique voxel
    records + fused select sweep, as two f32 payload matmuls per chunk.

    flat_sorted: i32[N] ascending flat ids; exactly ONE record per voxel may
        carry a nonzero payload (the segment-last record in the per-visit
        pipeline) — the one-hot deposit sum then has a single nonzero
        product per voxel, so the payload lands EXACTLY (f32).
    w_vals/d_vals: f32[N] payloads, zero except at the depositing record.
        Voxels whose deposited weight is 0 keep their stored pair
        (w_vals > 0 is the touched predicate, matching integrate_tsdf's
        pend_w > 0 select).

    Returns (weight_plane', dist_plane').  Replaces the compacted
    sort + two windowed scatters of integrate_tsdf.compact_deposit
    (~3.7 ms per scatter at bench shapes, docs/PERF.md).
    """
    cap = cfg.capacity
    v = cfg.voxels_per_region
    hi = v // LO
    t = weight_plane.shape[0]
    if t % LO:
        raise ValueError(f"arena length {t} not a multiple of {LO}")
    if t // LO < (cap + 1) * hi:
        raise ValueError("arena tail too small for the dummy deposit block")
    n = flat_sorted.shape[0]
    pad = (-n) % CHUNK
    if pad:
        flat_sorted = jnp.concatenate(
            [flat_sorted, jnp.full((pad,), cfg.sentinel, jnp.int32)])
        zpad = jnp.zeros((pad,), jnp.float32)
        w_vals = jnp.concatenate([w_vals, zpad])
        d_vals = jnp.concatenate([d_vals, zpad])
    keys2d = flat_sorted.reshape(-1, 128)
    w2d = w_vals.reshape(-1, 128)
    d2d = d_vals.reshape(-1, 128)

    bounds = jnp.searchsorted(
        flat_sorted, jnp.arange(cap + 1, dtype=jnp.int32) * v).astype(jnp.int32)
    c0 = bounds[:-1] // CHUNK
    c1 = (bounds[1:] + CHUNK - 1) // CHUNK

    wp2d = weight_plane.reshape(t // LO, LO)
    dp2d = dist_plane.reshape(t // LO, LO)

    def _block_ix(s, c0_ref, c1_ref):
        return (jnp.where(c1_ref[s] > c0_ref[s], s, cap), 0)

    def kernel(c0_ref, c1_ref, keys_hbm, wv_hbm, dv_hbm, wp_ref, dp_ref,
               wout_ref, dout_ref, keyvm, wvm, dvm, accw, accd, sem):
        s = pl.program_id(0)
        base = jnp.int32(s) * v
        lo0 = c0_ref[s]
        hi1 = c1_ref[s]
        live = hi1 > lo0

        @pl.when(live)
        def _live_step():
            # accw/accd hold FOUR byte planes each (u8x4 split — a plain f32
            # payload dot lowers as lossy single-pass bf16 on this Mosaic;
            # see gather_planes_f32).  Bytes recombine in int32 at the sweep.
            accw[...] = jnp.zeros_like(accw)
            accd[...] = jnp.zeros_like(accd)
            ihc = jax.lax.broadcasted_iota(jnp.int32, (hi, CHUNK), 0)
            ilc = jax.lax.broadcasted_iota(jnp.int32, (LO, CHUNK), 0)

            def get_dma(slot, c):
                return [
                    pltpu.make_async_copy(
                        keys_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                        keyvm.at[slot], sem.at[slot, 0]),
                    pltpu.make_async_copy(
                        wv_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                        wvm.at[slot], sem.at[slot, 1]),
                    pltpu.make_async_copy(
                        dv_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                        dvm.at[slot], sem.at[slot, 2]),
                ]

            for cp in get_dma(lo0 & 1, lo0):
                cp.start()

            def body(c, _):
                slot = c & 1

                @pl.when(c + 1 < hi1)
                def _prefetch():
                    for cp in get_dma((c + 1) & 1, c + 1):
                        cp.start()

                for cp in get_dma(slot, c):
                    cp.wait()
                k = jnp.concatenate(
                    [keyvm[slot, r:r + 1, :] for r in range(_ROWS)], axis=1)
                wv = jnp.concatenate(
                    [wvm[slot, r:r + 1, :] for r in range(_ROWS)], axis=1)
                dv = jnp.concatenate(
                    [dvm[slot, r:r + 1, :] for r in range(_ROWS)], axis=1)
                in_slot = (k >= base) & (k < base + v)
                vloc = k - base
                lo_b = vloc & (LO - 1)
                hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
                # Masks combine in f32 then convert: Mosaic rejects the i1
                # (8,128)-tiled mask relayout into bf16 (16,128) tiling
                # ("Invalid relayout ... vector<64x512xi1>").
                match_f = ((ihc == hi_b) & in_slot).astype(jnp.float32)
                oh_lo = (((ilc == lo_b) & in_slot).astype(jnp.float32)
                         ).astype(jnp.bfloat16)               # (LO, CHUNK)
                wbits = jax.lax.bitcast_convert_type(wv, jnp.int32)
                dbits = jax.lax.bitcast_convert_type(dv, jnp.int32)
                for byte in range(4):
                    wpiece = ((wbits >> (8 * byte)) & 255).astype(jnp.float32)
                    dpiece = ((dbits >> (8 * byte)) & 255).astype(jnp.float32)
                    oh_w = (match_f * wpiece).astype(jnp.bfloat16)
                    oh_d = (match_f * dpiece).astype(jnp.bfloat16)
                    accw[byte] += jax.lax.dot_general(
                        oh_w, oh_lo, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    accd[byte] += jax.lax.dot_general(
                        oh_d, oh_lo, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return _

            jax.lax.fori_loop(lo0, hi1, body, 0, unroll=False)
            wbits_p = jnp.zeros((hi, LO), jnp.int32)
            dbits_p = jnp.zeros((hi, LO), jnp.int32)
            for byte in range(4):
                wbits_p = wbits_p + (accw[byte].astype(jnp.int32) << (8 * byte))
                dbits_p = dbits_p + (accd[byte].astype(jnp.int32) << (8 * byte))
            w_new = jax.lax.bitcast_convert_type(wbits_p, jnp.float32)
            d_new = jax.lax.bitcast_convert_type(dbits_p, jnp.float32)
            touched = w_new > 0
            wout_ref[...] = jnp.where(touched, w_new, wp_ref[...])
            dout_ref[...] = jnp.where(touched, d_new, dp_ref[...])

        @pl.when(~live)
        def _dead_step():
            wout_ref[...] = wp_ref[...]
            dout_ref[...] = dp_ref[...]

    block = pl.BlockSpec((hi, LO), _block_ix, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + [block, block],
        out_specs=[block, block],
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, 128), jnp.int32),
            pltpu.VMEM((2, _ROWS, 128), jnp.float32),
            pltpu.VMEM((2, _ROWS, 128), jnp.float32),
            pltpu.VMEM((4, hi, LO), jnp.float32),
            pltpu.VMEM((4, hi, LO), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    wout, dout = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(wp2d.shape, jnp.float32),
                   jax.ShapeDtypeStruct(dp2d.shape, jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
        # operands after prefetch: keys(2), wv(3), dv(4), wp(5), dp(6)
        input_output_aliases={5: 0, 6: 1},
    )(c0, c1, keys2d, w2d, d2d, wp2d, dp2d)

    return wout.reshape(-1), dout.reshape(-1)
