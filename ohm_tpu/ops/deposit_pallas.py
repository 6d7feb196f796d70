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
                  interpret: bool = False):
    """Shared kernel: per-slot count deposit + fused per-slot sweep.

    occupancy: f32[T] flat arena (T % LO == 0 — VoxelArena rounds up).
    key_sorted: i32[N] ascending (flat << 1 | hit); sentinel records fall
        outside every slot range and are ignored.
    sweep_fn(initial, hit_cnt, miss_cnt, *extras) -> swept plane; runs on
        EVERY slot (zero counts on slots without records — extras may still
        demand a sweep there, e.g. the NDT miss-delta plane).
    extra_planes: flat f32[T] arrays blocked per slot like occupancy.

    Returns (occupancy', touched) where touched is the distinct-voxel count
    of the stream.  Nothing is ever dropped (no scatter_cap in this path).
    """
    cap = cfg.capacity
    v = cfg.voxels_per_region
    hi = v // LO
    t = occupancy.shape[0]
    if t % LO:
        raise ValueError(f"arena length {t} not a multiple of {LO}")
    n = key_sorted.shape[0]
    pad = (-n) % CHUNK
    if pad:
        # Sentinel keys are the stream maximum, so appending keeps sortedness.
        key_sorted = jnp.concatenate(
            [key_sorted, jnp.full((pad,), (cfg.sentinel << 1) | 1, jnp.int32)])
    keys2d = key_sorted.reshape(-1, 128)

    flat_s = key_sorted >> 1
    bounds = jnp.searchsorted(
        flat_s, jnp.arange(cap + 1, dtype=jnp.int32) * v).astype(jnp.int32)
    c0 = bounds[:-1] // CHUNK
    c1 = (bounds[1:] + CHUNK - 1) // CHUNK

    occ2d = occupancy.reshape(t // LO, LO)
    extras2d = [p.reshape(t // LO, LO) for p in extra_planes]
    n_extra = len(extras2d)

    def kernel(c0_ref, c1_ref, keys_hbm, occ_ref, *rest):
        extra_refs = rest[:n_extra]
        out_ref, keyvm, accum, sem = rest[n_extra:]
        s = pl.program_id(0)
        base = jnp.int32(s) * v
        lo0 = c0_ref[s]
        hi1 = c1_ref[s]
        accum[...] = jnp.zeros_like(accum)

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                keys_hbm.at[pl.ds(c * _ROWS, _ROWS), :],
                keyvm.at[slot], sem.at[slot])

        @pl.when(hi1 > lo0)
        def _deposit():
            ihc = jax.lax.broadcasted_iota(jnp.int32, (2 * hi, CHUNK), 0)
            ilc = jax.lax.broadcasted_iota(jnp.int32, (LO, CHUNK), 0)
            get_dma(lo0 & 1, lo0).start()

            def body(c, _):
                slot = c & 1

                @pl.when(c + 1 < hi1)
                def _prefetch():
                    get_dma((c + 1) & 1, c + 1).start()

                get_dma(slot, c).wait()
                # Lane-concatenate the chunk's rows into one (1, CHUNK)
                # record row; both one-hot factors build in one shot and
                # ONE k=CHUNK int8 MXU matmul deposits the whole chunk.
                k = jnp.concatenate(
                    [keyvm[slot, r:r + 1, :] for r in range(_ROWS)], axis=1)
                flat = k >> 1
                hit = k & 1
                in_slot = (flat >= base) & (flat < base + v)
                vloc = flat - base
                lo_b = vloc & (LO - 1)
                hi_b = (vloc >> 9) & (hi - 1) if hi > 1 else vloc >> 9
                # hit rows [0, hi), miss rows [hi, 2*hi) in one factor
                w = jnp.where(ihc < hi, hit, 1 - hit)
                oh_hi = jnp.where(((ihc % hi) == hi_b) & in_slot,
                                  w, 0).astype(jnp.int8)       # (2*hi, CHUNK)
                oh_lo = (ilc == lo_b).astype(jnp.int8)         # (LO, CHUNK)
                accum[...] += jax.lax.dot_general(
                    oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                return _

            jax.lax.fori_loop(lo0, hi1, body, 0, unroll=False)

        out_ref[...] = sweep_fn(occ_ref[...], accum[:hi], accum[hi:],
                                *[r[...] for r in extra_refs])

    block = pl.BlockSpec((hi, LO), lambda s, *_: (s, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]       # keys2d
        + [block] * (1 + n_extra),                         # occ + extras
        out_specs=block,
        scratch_shapes=[
            pltpu.VMEM((2, _ROWS, 128), jnp.int32),
            pltpu.VMEM((2 * hi, LO), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out2d = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(occ2d.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # operand order after scalar prefetch: keys2d (2), occ2d (3).
        # Aliasing occ in->out makes the update in-place under donation;
        # grid blocks beyond slot `cap` (sentinel + scratch tail rows) are
        # never written and keep their contents either way.
        input_output_aliases={3: 0},
    )(c0, c1, keys2d, occ2d, *extras2d)

    # touched = distinct non-sentinel voxel ids in the sorted stream — a
    # cheap fused diff over keys the deposit already reads (a per-slot SMEM
    # count output would violate Mosaic's (8,128) min output-block rule).
    ids = flat_s
    last = jnp.concatenate([ids[1:] != ids[:-1], jnp.array([True])])
    touched = jnp.sum((last & (ids != cfg.sentinel)).astype(jnp.int32))
    return out2d.reshape(-1), touched


def deposit_and_sweep(occupancy, key_sorted, cfg, interpret: bool = False):
    """Occupancy-family deposit: replaces sorted_hit_miss_counts +
    _apply_occupancy_dense + _occupancy_sweep in ops.integrate.apply_records.
    Returns (occupancy', touched)."""
    return _deposit_core(
        occupancy, key_sorted, cfg,
        lambda initial, h, m: _sweep_block(initial, h, m, cfg),
        interpret=interpret)


def deposit_and_sweep_ndt(occupancy, key_sorted, delta_plane, cfg,
                          interpret: bool = False):
    """NDT-family deposit: standard hit/miss counts from the sorted key
    stream plus the Gaussian miss-delta plane (integrate_ndt's pending_delta,
    an arena-shaped f32 scatter of the compacted NDT miss phase).  The sweep
    runs on every slot — a slot can carry deltas without std records.
    Returns (occupancy', touched_std)."""
    return _deposit_core(
        occupancy, key_sorted, cfg,
        lambda initial, h, m, d: _ndt_sweep_block(initial, h, m, d, cfg),
        extra_planes=(delta_plane,), interpret=interpret)
