"""Fused ray-batch integration: DDA expand -> slot resolve -> sort ->
segment-reduce -> scatter.

TPU-native replacement for the reference GPU update kernels
(ohmgpu/gpu/RegionUpdate.cl regionRayUpdateOccupancy and friends).  Where the
reference resolves write conflicts with per-voxel float CAS retry loops
(RegionUpdate.cl:29-32,403-470), this pipeline sorts all (voxel, contribution)
records by arena address and applies one conflict-free, deterministic update
per touched voxel — XLA has no CAS, and doesn't need one.

Region resolution is host-assisted: ray segments are cut to at most one
region edge (mapping.batch), so each segment touches at most a 2x2x2 box of
regions whose arena slots the host passes per segment ("corner slots").  The
device resolves a voxel's slot with an 8-way select — no hash-table gathers
in the hot path (gathers of 1M+ indices cost ~6 ms each on TPU; the corner
trick replaces 24 of them with vector arithmetic).  The reference's analogue
is the region-key linear search with last-hit cache in ohmgpu/gpu/Regions.cl.

The batch crosses host->HBM as four packed arrays (ints/floats/flags/touch)
because each transfer through the runtime carries fixed latency.

Batch-vs-sequential semantics: per-voxel exclusion flags (kRfExcludeFree etc.)
and saturation are evaluated against the voxel state at *batch start*, exactly
as the reference GPU does implicitly under CAS races
(docs/gpu/docgpudetail.md:55-66).  Within a batch, multiple hits/misses on one
voxel accumulate before a single clamp, which matches sequential clamping
except when a voxel's value crosses a clamp bound and returns — the reference
GPU is itself non-deterministic in that regime.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ohm_tpu.core.rayflags import RayFlag
from ohm_tpu.ops import subvoxel_jnp
from ohm_tpu.ops.ddawalk import walk_rays


def _unobserved(x, zero: bool = False):
    # Two arena encodings for "never observed":
    #  - 'inf'  (+inf, the reference's voxel::invalidMarkerValue) — isposinf
    #    rather than == inf because the TPU/axon toolchain pathologically
    #    slow-compiles kernels with f32 inf constants (see ops.ddawalk._BIG).
    #  - 'zero' (-0.0) — used by the delta fast path (apply_delta_jit) so the
    #    occupancy update is a pure scatter-ADD: IEEE -0.0 + x == x, and
    #    -0.0 + +0.0 == +0.0 marks "observed with value exactly 0" for free.
    if zero:
        return (x == 0) & (jnp.signbit(x))
    return jnp.isposinf(x)


@dataclasses.dataclass(frozen=True)
class IntegrateConfig:
    """Static (compile-time) configuration for the integrate kernel."""

    resolution: float
    region_shift: int  # log2(region voxel dim); dims must be cubic power-of-two
    capacity: int  # arena capacity in regions
    max_steps: int  # DDA step cap per (segmented) ray
    ray_flags: int = 0
    # Layer presence:
    with_mean: bool = False
    with_traversal: bool = False
    with_touch_time: bool = False
    with_incident: bool = False
    # Probability model (f32):
    hit_value: float = 0.0
    miss_value: float = 0.0
    occupancy_threshold: float = 0.0
    min_value: float = 0.0
    max_value: float = 0.0
    saturation_min: float = float("-inf")
    saturation_max: float = float("inf")
    #: Occupancy arena encoding: True = unobserved stored as -0.0 (delta
    #: fast path), False = +inf (reference marker).
    zero_unobserved: bool = False
    #: Scatter budget for the delta fast path: per-batch touched voxels
    #: beyond this are dropped (counted in stats['dropped_updates']).
    #: 0 = no cap (scatter the full record stream).
    scatter_cap: int = 0

    #: Scratch tail appended to arena arrays: unique dummy scatter targets
    #: for non-segment-last records (see _segment_apply).
    scatter_pad: int = 1 << 22

    #: Group compaction of the walk-record stream (expand_records_jit): rows
    #: of `group_size` segments are key-sorted (sentinel padding to the back)
    #: and truncated to `group_cap` records.  The host picks group_cap from
    #: the exact per-group crossing counts (mapping.batch knows them), so
    #: truncation only ever drops sentinel padding; stats['compaction_dropped']
    #: counts violations.  0 disables.  Shrinks the downstream global sort by
    #: the walk stream's ~50% padding fraction for a narrow row-sort.
    group_cap: int = 0
    group_size: int = 64

    #: Packed-wire float width selector: TSDF configs carry t0/full_length
    #: (width 12) in the single-transfer wire (see _wire_float_width).
    wire_tsdf: bool = False

    #: Rayflow candidate-table width (mapping.batch.prepare_rayflow): the
    #: static K of the per-ray region/slot table in the rayw wire.  0 when
    #: the batch uses the segmented wire.
    table_k: int = 0

    #: Rayflow dictionary wire mode: the candidate block ships as a per-batch
    #: packed-candidate dictionary + small indices instead of i32 candidates
    #: (4K B/ray); the device reconstructs tcand = dict[cidx] bit-identically.
    #: Mode 1: 256-entry dict + u8 indices (K B/ray), batches touching <= 255
    #: regions.  Mode 2: 2048-entry dict + u16 indices (2K B/ray), <= 2047
    #: regions.  0 = full i32 block.  The tunnel runs ~40 MB/s, so candidate
    #: bytes were ~60% of the transfer cost.
    rayw_cdict: int = 0

    #: Rayflow start_frac dictionary: rays sharing a sensor pose quantise to
    #: bit-identical start_frac triples, so static-scan batches ship a
    #: 256-entry f32[,3] dict + u8 index (12 -> 1 B/ray); reconstruction is
    #: an exact table gather.  Chosen per batch when <= 255 distinct triples
    #: (mapping.batch.frac_dict_of); moving-origin scans fall back.
    rayw_fdict: bool = False

    #: Walk record-axis truncation cap.  0 = sqrt(3)*max_steps default,
    #: which is only valid when max_steps is a LENGTH bound (segmented
    #: path); rayflow sets this from the batch's exact max total crossings
    #: (a diagonal full ray reaches 3x its max per-axis count).
    walk_cap: int = 0

    #: Rayflow wire carries the per-ray intensity block (NDT-TM); touch
    #: rides only when with_touch_time.  Both default off, trimming the
    #: wire 8 B/ray for plain occupancy/TSDF (every byte crosses the
    #: serialised host->HBM tunnel).
    rayw_intensity: bool = False

    #: Rank-based walk (ops.ddawalk.walk_rays_unordered): skip the per-ray
    #: event sort; records come out axis-major with the identical voxel set
    #: (same masked-key total order).  Only sensible with group compaction
    #: (group_cap > 0) to absorb the wider 3*max_steps record axis, and
    #: never with kRfStopOnFirstOccupied (which needs time order).
    unordered_walk: bool = False

    #: Fused row-local apply (apply_records_fused_jit): per-compaction-row
    #: unique-voxel budget.  Each expand row is already sorted, so per-row
    #: counts come from position diffs and per-row voxel-lasts compact into
    #: [rows, row_cap] by ONE row sort — no global record sort at all; the
    #: per-row partial counts meet in a duplicate-index scatter-ADD (integer
    #: adds: exact and deterministic).  Sized like scatter_cap (readback +
    #: 2x headroom, monotone); over-budget rows drop lasts into
    #: stats['dropped_updates'].  0 disables the fused path.
    row_cap: int = 0

    #: MXU one-hot matmul deposit (ops.deposit_pallas): replaces the unique
    #: scatter + dense sweep in apply_records with a slot-grid Pallas kernel
    #: (measured 2.8 ms vs 9.2 ms at bench shapes).  0 = off, 1 = compiled
    #: (TPU), 2 = interpret mode (CPU differential tests).  Used when
    #: deposit_pallas.deposit_ok(cfg) and the occupancy path carries no
    #: traversal payload; otherwise apply_records falls back silently.
    pallas_deposit: int = 0

    #: Fused expand kernel (ops.expand_pallas): the rank walk + slot resolve
    #: chain runs as one VPU Pallas kernel writing only the key plane
    #: (+ traversal payload), replacing ~a dozen [B, 3S] HBM intermediates.
    #: 0 = off, 1 = compiled (TPU), 2 = interpret (CPU differentials).
    #: Applies on the rayflow wire with the rank walk + group compaction
    #: (expand_pallas.expand_eligible); other paths fall back silently.
    pallas_expand: int = 0

    def __post_init__(self):
        # Flat arena addresses and split-phase sort keys are int32; the key
        # packs (flat << 1 | hit_bit), so the sentinel itself needs headroom:
        # capacity * voxels_per_region must stay below 2^30, and the scratch
        # tail (pad_base + scatter_pad) below 2^31.
        sentinel = self.capacity * (1 << (3 * self.region_shift))
        if ((sentinel << 1) | 1) > 2**31 - 1:
            raise ValueError(
                f"arena capacity {self.capacity} x {1 << (3 * self.region_shift)} voxels/region "
                f"overflows the int32 sort key (need capacity * voxels_per_region < 2^30)")
        if sentinel + 1 + self.scatter_pad > 2**31 - 1:
            raise ValueError(
                f"arena + scatter_pad ({sentinel + 1 + self.scatter_pad}) overflows int32 addressing")

    @property
    def voxels_per_region(self) -> int:
        return 1 << (3 * self.region_shift)

    @property
    def sentinel(self) -> int:
        return self.capacity * self.voxels_per_region

    @property
    def pad_base(self) -> int:
        return self.sentinel + 1


# Host-side packed batch layout (mapping.batch.prepare_ray_batch):
#   ints  i32[B, 17]: start_abs xyz | end_abs xyz | rmin xyz | corner_slots[8]
#   floats f32[B, 12]: start_frac xyz | direction xyz | length | end_frac xyz | t0 | full_length
#   flags bool[B, 4]: is_sample | end_as_miss | exclude_start | valid
#   touch u32[B]: pre-encoded touch time
INTS_WIDTH = 17
FLOATS_WIDTH = 12
FLAGS_WIDTH = 4

# Compact wire layout (mapping.batch.compact_batch) — what actually crosses
# host->HBM.  Segments are at most one region edge long, so endpoint voxel
# coordinates are 6-bit offsets from the segment's minimum region origin:
#   ints16 i16[B, 11]: rmin xyz | corner_slots[8]   (slots < 32767 regions)
#   offs   u32[B]:     start xyz (3x6 bits) | end xyz (3x6 bits)  36 bits? ->
#                      packed as two u32 halves in offs[B, 2]
#   floats f32[B, W]:  W=7 base (start_frac, direction, length);
#                      +3 (end_frac) when mean/NDT; +2 (t0, full_len) for TSDF
#   flags bool[B, 4], touch u32[B] as before.


def _wire_float_width(cfg) -> int:
    """Float block width in the compact wire (mapping.batch.compact_batch)."""
    # TSDF configs carry t0/full_length (12); mean/NDT carry end_frac (10).
    if getattr(cfg, "wire_tsdf", False):
        return 12
    return 10 if (cfg is not None and cfg.with_mean) else 7


def group_rows(flat, B, S, G):
    """[B*S] record stream -> [B//G, G*S] compaction rows with STRIDED
    segment assignment (row r <- segments r, r+R, r+2R, ...).  Consecutive
    segments belong to the same ray and correlate strongly in crossing count
    (a long diagonal ray emits a run of ~55-crossing segments), so contiguous
    grouping forces a loose per-row cap; striding decorrelates them and lets
    the host pick a cap close to the mean group load."""
    R = B // G
    return flat.reshape(G, R, S).transpose(1, 0, 2).reshape(R, G * S)


def _unpack_batch(batch, cfg=None):
    if "start_abs" in batch:
        # Already unpacked (the sharded rayflow path unpacks on the SOURCE
        # shard, routes the field arrays over ICI, and feeds the destination
        # core the routed dict directly — parallel.rayflow).
        return batch
    if "rayw" in batch:
        # Full-ray wire (mapping.batch.prepare_rayflow / rayflow_wire):
        # per-RAY records, 40 + 4K (+4 touch when with_touch_time, +4
        # intensity when rayw_intensity) B/ray — gmeta i32[8] | floats
        # f32[R,7] (start_frac, dir, length) | abs16 u16[R,6] (endpoint
        # voxels, bbox-relative, 11 bits; the 5 spare high bits carry
        # valid/fold + the 16-bit source ray index — batch_prep.cpp
        # rayflow_finish) | [touch u32] | [intens f32] |
        # tcand i32[R,K] (packed candidates: (slot+1)<<18 | bbox-rel region).
        # Endpoints were quantised on the host in f64, so the exact reference
        # crossing counts are preserved; every per-segment quantity of the
        # segmented wire is derived here instead.
        buf = batch["rayw"]
        K = cfg.table_k
        with_touch = cfg.with_touch_time if cfg is not None else True
        with_intens = getattr(cfg, "rayw_intensity", False) if cfg is not None else True
        cdict = int(getattr(cfg, "rayw_cdict", 0)) if cfg is not None else 0
        fdict = getattr(cfg, "rayw_fdict", False) if cfg is not None else False
        fw = 4 if fdict else 7
        # cdict mode: 0 = full i32 candidates (4K B/ray), 1 = u8 dictionary
        # (K B/ray + 1 KiB), 2 = u16 dictionary (2K B/ray + 8 KiB).
        cand_bpr = {0: 4 * K, 1: K, 2: 2 * K}[cdict]
        cand_fixed = {0: 0, 1: 1024, 2: 8192}[cdict]
        bpr = (4 * fw + 12 + (1 if fdict else 0) + cand_bpr
               + (4 if with_touch else 0) + (4 if with_intens else 0))
        R = (buf.shape[0] - 32 - cand_fixed - (3072 if fdict else 0)) // bpr
        off = 0

        def take(nbytes):
            nonlocal off
            part = buf[off:off + nbytes]
            off += nbytes
            return part

        gmeta = jax.lax.bitcast_convert_type(take(32).reshape(8, 4), jnp.int32)
        floats = jax.lax.bitcast_convert_type(
            take(4 * fw * R).reshape(R, fw, 4), jnp.float32)
        a16raw = jax.lax.bitcast_convert_type(
            take(12 * R).reshape(R, 6, 2), jnp.uint16).astype(jnp.int32)
        a16 = a16raw & 0x7FF
        hi = a16raw >> 11
        touch = (jax.lax.bitcast_convert_type(take(4 * R).reshape(R, 4), jnp.uint32)
                 if with_touch else jnp.zeros((R,), jnp.uint32))
        intens = (jax.lax.bitcast_convert_type(take(4 * R).reshape(R, 4), jnp.float32)
                  if with_intens else jnp.zeros((R,), jnp.float32))
        frac_tab = fidx = None
        if fdict:
            frac_tab = jax.lax.bitcast_convert_type(
                take(3072).reshape(256, 3, 4), jnp.float32)
            fidx = take(R).astype(jnp.int32)
        if cdict == 2:
            cand_dict = jax.lax.bitcast_convert_type(
                take(8192).reshape(2048, 4), jnp.int32)
            cidx = jax.lax.bitcast_convert_type(
                take(2 * K * R).reshape(R, K, 2), jnp.uint16).astype(jnp.int32)
            tcand = cand_dict[cidx]
        elif cdict:
            cand_dict = jax.lax.bitcast_convert_type(
                take(1024).reshape(256, 4), jnp.int32)
            cidx = take(K * R).reshape(R, K).astype(jnp.int32)
            tcand = cand_dict[cidx]
        else:
            tcand = jax.lax.bitcast_convert_type(take(4 * K * R).reshape(R, K, 4), jnp.int32)

        dim = jnp.int32(1 << (cfg.region_shift if cfg is not None else 5))
        bbox_min_vox = gmeta[0:3] * dim
        start_abs = a16[:, 0:3] + bbox_min_vox[None, :]
        end_abs = a16[:, 3:6] + bbox_min_vox[None, :]
        valid = (hi[:, 0] & 1) != 0
        fold = (hi[:, 0] & 2) != 0
        ray_order = ((hi[:, 0] >> 2) | (hi[:, 1] << 3)
                     | (hi[:, 2] << 8) | (hi[:, 3] << 13))
        if fdict:
            direction = floats[:, 0:3]
            length = floats[:, 3]
            start_frac = frac_tab[fidx]  # exact table gather (bit-identical)
        else:
            direction = floats[:, 3:6]
            length = floats[:, 6]
            start_frac = floats[:, 0:3]
        res = jnp.float32(cfg.resolution if cfg is not None else 0.1)
        end_frac = (start_frac + (start_abs - end_abs).astype(jnp.float32) * res
                    + length[:, None] * direction)
        return {
            "start_abs": start_abs,
            "end_abs": end_abs,
            "start_frac": start_frac,
            "direction": direction,
            "length": length,
            "end_frac": end_frac,
            "is_sample": valid & ~fold,
            "end_as_miss": valid & fold,
            "exclude_start": valid,  # every ray record contains its origin
            "valid": valid,
            "touch_enc": touch,
            "intensity": intens,
            "t0": jnp.zeros_like(length),
            "full_length": length,
            "tcand": tcand,
            "gmeta": gmeta,
            # Source ray index (abs16 spare bits): the host may permute wire
            # rows (snake ordering, mapping.batch.snake_perm); order-
            # sensitive consumers (TSDF per-visit sequence) key on the
            # ORIGINAL ray order via this field.
            "ray_order": ray_order.astype(jnp.int32),
        }
    if "wire" in batch:
        # Single-buffer packed layout (mapping.batch.pack_wire): one
        # host->device transfer instead of five.  Layout is static given the
        # cfg layer set and the buffer length.
        buf = batch["wire"]
        w = _wire_float_width(cfg)
        with_touch = cfg.with_touch_time if cfg is not None else True
        bps = 4 * w + 8 + (4 if with_touch else 0) + 22 + 4  # bytes/segment
        B = buf.shape[0] // bps  # alignment pad is < 4 bytes; floor is exact
        off = 0

        def take(nbytes):
            nonlocal off
            part = buf[off:off + nbytes]
            off += nbytes
            return part

        floats = jax.lax.bitcast_convert_type(
            take(4 * w * B).reshape(B, w, 4), jnp.float32)
        offs = jax.lax.bitcast_convert_type(
            take(8 * B).reshape(B, 2, 4), jnp.uint32)
        touch = (jax.lax.bitcast_convert_type(
            take(4 * B).reshape(B, 4), jnp.uint32)
            if with_touch else jnp.zeros((B,), jnp.uint32))
        ints16 = jax.lax.bitcast_convert_type(
            take(22 * B).reshape(B, 11, 2), jnp.int16)
        flags = take(4 * B).reshape(B, 4) != 0
        batch = {"ints16": ints16, "offs": offs, "floats": floats,
                 "flags": flags, "touch": touch}
        # fall through to the compact-wire unpack below
    if "ints" in batch:
        ints = batch["ints"]
        floats = batch["floats"]
        flags = batch["flags"]
        out = {
            "start_abs": ints[:, 0:3],
            "end_abs": ints[:, 3:6],
            "rmin": ints[:, 6:9],
            "corner_slots": ints[:, 9:17],
            "start_frac": floats[:, 0:3],
            "direction": floats[:, 3:6],
            "length": floats[:, 6],
            "is_sample": flags[:, 0],
            "end_as_miss": flags[:, 1],
            "exclude_start": flags[:, 2],
            "valid": flags[:, 3],
            "touch_enc": batch["touch"],
        }
        if floats.shape[1] >= 10:
            out["end_frac"] = floats[:, 7:10]
        if floats.shape[1] >= 12:
            out["t0"] = floats[:, 10]
            out["full_length"] = floats[:, 11]
        return out
    # Compact wire layout.
    ints16 = batch["ints16"].astype(jnp.int32)
    offs = batch["offs"]
    floats = batch["floats"]
    flags = batch["flags"]
    rmin = ints16[:, 0:3]
    shift = cfg.region_shift if cfg is not None else 5
    base = rmin << shift
    mask6 = jnp.uint32(0x3F)
    s_off = jnp.stack([
        (offs[:, 0] & mask6), (offs[:, 0] >> 6) & mask6, (offs[:, 0] >> 12) & mask6], axis=-1)
    e_off = jnp.stack([
        (offs[:, 1] & mask6), (offs[:, 1] >> 6) & mask6, (offs[:, 1] >> 12) & mask6], axis=-1)
    out = {
        "start_abs": base + s_off.astype(jnp.int32),
        "end_abs": base + e_off.astype(jnp.int32),
        "rmin": rmin,
        "corner_slots": ints16[:, 3:11],
        "start_frac": floats[:, 0:3],
        "direction": floats[:, 3:6],
        "length": floats[:, 6],
        "is_sample": flags[:, 0],
        "end_as_miss": flags[:, 1],
        "exclude_start": flags[:, 2],
        "valid": flags[:, 3],
        "touch_enc": batch["touch"],
    }
    if floats.shape[1] >= 10:
        out["end_frac"] = floats[:, 7:10]
    if floats.shape[1] >= 12:
        out["t0"] = floats[:, 10]
        out["full_length"] = floats[:, 11]
    return out


def _resolve_slots(voxels, rmin, corner_slots, cfg: IntegrateConfig,
                   tcand=None, gmeta=None):
    """Voxel abs coords -> flat arena addresses.

    Segmented path: per-segment corner slots (rmin i32[B,3], corner_slots
    i32[B,8]) — each segment spans <= 2 regions per axis.  Rayflow path
    (tcand given): each record's packed bbox-relative region is compared
    against its RAY's K candidates (tcand i32[B,K] = (slot+1) << 18 |
    rel-region 6 bits/axis) — a pure vector equality select, no gathers; the
    full-ray analogue of the corner-slot trick (a ray crosses many regions,
    so the candidate set is K-wide instead of 8).
    Returns (flat ids, missed mask).  local index ordering x + y*dim +
    z*dim^2 preserves the reference linearisation (ohm/MapChunk.h:33-38).
    """
    shift = cfg.region_shift
    dim_mask = (1 << shift) - 1
    region = voxels >> shift
    local = voxels & dim_mask

    if tcand is not None:
        rel = region - gmeta[0:3]
        packed = rel[..., 0] | (rel[..., 1] << 6) | (rel[..., 2] << 12)
        in_box = jnp.all((rel >= 0) & (rel < 64), axis=-1)
        packed = jnp.where(in_box, packed, jnp.int32(-1))  # never matches
        # Broadcast the per-ray candidates over the record axis: voxels is
        # [B, S, 3] (walk records) or [B, 3] (end voxels).
        expand = (slice(None),) + (None,) * (voxels.ndim - 2)
        slot = jnp.full(voxels.shape[:-1], jnp.int32(-1))
        K = tcand.shape[1]
        rel_mask = jnp.int32(0x3FFFF)
        for k in range(K):
            cand = tcand[:, k][expand]
            cand_slot = (cand >> 18) - 1
            match = ((cand & rel_mask) == packed) & (cand_slot >= 0)
            slot = jnp.where(match, cand_slot, slot)
        missed = slot < 0
        local_idx = local[..., 0] + (local[..., 1] << shift) + (local[..., 2] << (2 * shift))
        flat = slot * cfg.voxels_per_region + local_idx
        return jnp.where(missed, cfg.sentinel, flat), missed

    # Broadcast per-ray values across the step axis when present.
    expand = (slice(None),) + (None,) * (voxels.ndim - 2)
    d = region - rmin[expand]
    in_box = jnp.all((d >= 0) & (d <= 1), axis=-1)
    dc = jnp.clip(d, 0, 1)
    cidx = dc[..., 0] + 2 * dc[..., 1] + 4 * dc[..., 2]

    slot = jnp.zeros(voxels.shape[:-1], jnp.int32)
    for k in range(8):
        slot_k = corner_slots[:, k][expand]  # [B] or [B,1]
        slot = slot + jnp.where(cidx == k, slot_k, 0)
    missed = ~in_box | (slot < 0)

    local_idx = local[..., 0] + (local[..., 1] << shift) + (local[..., 2] << (2 * shift))
    flat = slot * cfg.voxels_per_region + local_idx
    flat = jnp.where(missed, cfg.sentinel, flat)
    return flat, missed


def _segment_reduce(ids_sorted, payloads, cfg):
    """Segment totals over sorted ids, without conflicting scatters.

    TPU scatters serialise duplicate indices (a padded batch yields ~10^6
    writes to one sentinel slot), so reduction uses a segmented inclusive
    scan (log-depth associative_scan) instead: each record carries the
    running segment total; the total is valid at each segment's LAST record.

    Returns (last_mask, totals...) where totals[i] aligns with ids_sorted
    and is meaningful where last_mask.  Fully deterministic.
    """
    n = ids_sorted.shape[0]
    first = jnp.concatenate([jnp.array([True]), ids_sorted[1:] != ids_sorted[:-1]])
    last = jnp.concatenate([ids_sorted[1:] != ids_sorted[:-1], jnp.array([True])])

    sums = []
    maxes = []
    for payload, mode in payloads:
        f = first if payload.ndim == 1 else first[:, None]
        (sums if mode == "sum" else maxes).append((payload, f))

    results = {}
    if sums:
        def op_sum(a, b):
            out = []
            for (va, fa), (vb, fb) in zip(a, b):
                out.append((jnp.where(fb, vb, va + vb), fa | fb))
            return tuple(out)
        scanned = jax.lax.associative_scan(op_sum, tuple(sums))
        results["sum"] = [v for v, _ in scanned]
    if maxes:
        def op_max(a, b):
            out = []
            for (va, fa), (vb, fb) in zip(a, b):
                out.append((jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb))
            return tuple(out)
        scanned = jax.lax.associative_scan(op_max, tuple(maxes))
        results["max"] = [v for v, _ in scanned]

    out = []
    si = mi = 0
    for payload, mode in payloads:
        if mode == "sum":
            out.append(results["sum"][si]); si += 1
        else:
            out.append(results["max"][mi]); mi += 1
    return last, out


def _unique_scatter_indices(ids_sorted, last, cfg):
    """All-unique scatter targets: segment-last records write their voxel id,
    everything else writes into the arena's scratch tail (one distinct dummy
    slot per record)."""
    n = ids_sorted.shape[0]
    if n > cfg.scatter_pad:
        raise ValueError(f"record count {n} exceeds scatter_pad {cfg.scatter_pad}")
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    return jnp.where(last & (ids_sorted != cfg.sentinel), ids_sorted, cfg.pad_base + pos)


def _apply_occupancy_dense(occupancy, ids_sorted, last, n_hit, n_miss, cfg: IntegrateConfig,
                           trav=None, traversal_arena=None):
    """Occupancy update as sparse count deposit + dense arena sweep.

    A gather of ~10^6 random indices from the multi-hundred-MB arena costs
    ~25 ns/element on TPU (latency-bound), so instead of gather-modify-
    scatter, batch hit/miss counts are packed into one uint32 per touched
    voxel (hit << 16 | miss), scattered once with unique indices, and the
    nonlinear occupancy math (ohm/VoxelOccupancyCompute.h + the kRfExclude*
    matrix of ohm/RayMapperOccupancy.cpp:154-183) runs as a dense elementwise
    sweep over the arena at HBM streaming speed.  The sweep reads the
    batch-start occupancy, matching the reference GPU's CAS-race semantics.

    With scatter_cap > 0 the deposit COMPACTS first: voxel-last records are
    pulled to the stream front by a payload-carrying i32 sort and only the
    first scatter_cap rows scatter (sorted + unique + in-bounds — the
    fastest scatter lowering on this toolchain).  The full-stream scatter
    costs ~5.5 ns per STREAM element while only ~10% of records are
    voxel-lasts; the compaction trades that for one extra multi-operand
    sort.  Over-cap voxels (highest addresses) are dropped and counted.

    Returns (occupancy', traversal' | None, dropped_updates).
    """
    flags = cfg.ray_flags
    capf = jnp.float32(65535.0)
    packed = (jnp.minimum(n_hit, capf).astype(jnp.uint32) << 16) | jnp.minimum(n_miss, capf).astype(jnp.uint32)
    # Zero sentinel-group records too: the sentinel group's last record
    # carries huge capped counts and scatters into a scratch-tail slot, which
    # the dense sweep would turn into a garbage "observed" value that
    # accumulates across batches (scratch must stay clear).
    real_last = last & (ids_sorted != cfg.sentinel)
    packed = jnp.where(real_last, packed, jnp.uint32(0))
    n = ids_sorted.shape[0]
    dropped = jnp.int32(0)
    new_traversal = traversal_arena
    if 0 < cfg.scatter_cap < n:
        big = jnp.int32(2**31 - 2)
        key = jnp.where(real_last, ids_sorted, big)
        ops = (key, packed) + ((jnp.where(real_last, trav, 0.0),) if trav is not None else ())
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        cap = cfg.scatter_cap
        if cap > cfg.scatter_pad:
            raise ValueError(f"scatter_cap {cap} exceeds scatter_pad {cfg.scatter_pad}")
        kc = sorted_ops[0][:cap]
        pc = sorted_ops[1][:cap]
        cpos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        real = kc != big
        dropped = (jnp.sum(real_last.astype(jnp.int32))
                   - jnp.sum(real.astype(jnp.int32)))
        idx = jnp.where(real, kc, cfg.pad_base + cpos)
        pending = jnp.zeros(occupancy.shape, jnp.uint32).at[idx].set(
            jnp.where(real, pc, jnp.uint32(0)), indices_are_sorted=True,
            unique_indices=True, mode="promise_in_bounds")
        if trav is not None and traversal_arena is not None:
            tc = sorted_ops[2][:cap]
            new_traversal = traversal_arena.at[idx].add(
                jnp.where(real, tc, 0.0), indices_are_sorted=True,
                unique_indices=True, mode="promise_in_bounds")
    else:
        idx = _unique_scatter_indices(ids_sorted, last, cfg)
        pending = jnp.zeros(occupancy.shape, jnp.uint32).at[idx].set(packed, unique_indices=True)
        if trav is not None and traversal_arena is not None:
            new_traversal = traversal_arena.at[idx].add(
                jnp.where(last, trav, 0.0), unique_indices=True)

    return _occupancy_sweep(occupancy, pending, cfg), new_traversal, dropped


def _occupancy_sweep(occupancy, pending, cfg: IntegrateConfig):
    """Dense elementwise occupancy sweep over the arena from packed per-voxel
    batch counts (hit << 16 | miss in a uint32 plane).  Reads the batch-start
    occupancy, matching the reference GPU's CAS-race semantics, and encodes
    the full kRfExclude*/clamp/saturation matrix
    (ohm/VoxelOccupancyCompute.h + ohm/RayMapperOccupancy.cpp:154-183)."""
    flags = cfg.ray_flags
    n_hit_d = (pending >> 16).astype(jnp.float32)
    n_miss_d = (pending & jnp.uint32(0xFFFF)).astype(jnp.float32)

    initial = occupancy
    unobs = _unobserved(initial, cfg.zero_unobserved)
    free = ~unobs & (initial < cfg.occupancy_threshold)
    occd = ~unobs & (initial >= cfg.occupancy_threshold)

    zero = jnp.float32(0)
    hit_eff = jnp.full_like(initial, jnp.float32(cfg.hit_value))
    miss_eff = jnp.full_like(initial, jnp.float32(cfg.miss_value))
    if flags & RayFlag.EXCLUDE_FREE:
        hit_eff = jnp.where(free, zero, hit_eff)
        miss_eff = jnp.where(free, zero, miss_eff)
    if flags & RayFlag.EXCLUDE_OCCUPIED:
        hit_eff = jnp.where(occd, zero, hit_eff)
        miss_eff = jnp.where(occd, zero, miss_eff)

    total = n_hit_d * hit_eff + n_miss_d * miss_eff
    base = jnp.where(unobs, zero, initial)
    value = base + total
    # One-sided clamp by net adjustment direction, matching fmin-on-hit /
    # fmax-on-miss in the reference.
    value = jnp.where(total > 0, jnp.minimum(value, jnp.float32(cfg.max_value)), value)
    value = jnp.where(total < 0, jnp.maximum(value, jnp.float32(cfg.min_value)), value)

    touched = pending != 0
    saturated = ~unobs & ((initial <= jnp.float32(cfg.saturation_min)) | (initial >= jnp.float32(cfg.saturation_max)))
    keep = ~touched | saturated
    if flags & RayFlag.EXCLUDE_UNOBSERVED:
        keep = keep | unobs
    return jnp.where(keep, initial, value)


def integrate_occupancy(arena: dict, batch: dict, cfg: IntegrateConfig):
    """Integrate one fixed-shape packed ray batch into the arena.

    arena: dict of device arrays — 'occupancy' f32[C*V + 1 + scatter_pad]
    (sentinel element + scratch tail), plus optional 'traversal',
    'mean_coord', 'mean_count', 'touch_time', 'incident' (same length).
    batch: packed arrays (see _unpack_batch / mapping.batch).

    Returns (arena, stats): 'missed_updates' counts contributions dropped
    because a region slot was unresolved (zero when the host pre-allocated
    correctly); 'overflow' counts rays whose DDA exceeded max_steps (the host
    segmenter should prevent this).
    """
    flags = cfg.ray_flags
    b = _unpack_batch(batch, cfg)

    walk = walk_rays(
        b["start_abs"], b["end_abs"], b["start_frac"],
        b["direction"], b["length"], cfg.resolution, cfg.max_steps,
        total_cap=cfg.walk_cap or None,
    )

    B, S = walk["valid"].shape
    ray_valid = b["valid"]

    # --- walk (miss) records ------------------------------------------------
    rec_valid = walk["valid"] & ray_valid[:, None]
    if flags & RayFlag.EXCLUDE_ORIGIN:
        first = jnp.concatenate([jnp.ones((B, 1), bool), jnp.zeros((B, S - 1), bool)], axis=1)
        rec_valid = rec_valid & ~(first & b["exclude_start"][:, None])
    if flags & RayFlag.EXCLUDE_RAY:
        rec_valid = jnp.zeros_like(rec_valid)

    walk_flat, walk_missed = _resolve_slots(walk["voxels"], b.get("rmin"), b.get("corner_slots"), cfg, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
    walk_flat = jnp.where(rec_valid, walk_flat, cfg.sentinel)

    # kRfStopOnFirstOccupied: suppress occupancy adjustments after the first
    # initially-occupied voxel along each ray (batch-start state).  The walk
    # itself continues (the reference's visit still accumulates traversal —
    # ohm/RayMapperOccupancy.cpp:171-183), and the stop is set *after* the
    # occupied voxel's own miss adjustment.  The stop must carry across the
    # host's ray segmentation: segments of one ray are contiguous in the
    # batch with exclude_start marking the first, so a segmented OR-scan over
    # the segment axis propagates "an earlier segment saw an occupied voxel".
    if flags & RayFlag.STOP_ON_FIRST_OCCUPIED:
        occ_at = arena["occupancy"][walk_flat]
        occupied = ~_unobserved(occ_at, cfg.zero_unobserved) & (occ_at >= jnp.float32(cfg.occupancy_threshold)) & rec_valid
        seen_before = jnp.cumsum(occupied.astype(jnp.int32), axis=1) - occupied.astype(jnp.int32)
        seg_occ = jnp.any(occupied, axis=1)
        is_first_seg = b["exclude_start"]

        def _seg_or(a, c):
            (va, fa), (vc, fc) = a, c
            return jnp.where(fc, vc, va | vc), fa | fc

        stopped_inc, _ = jax.lax.associative_scan(_seg_or, (seg_occ, is_first_seg))
        prev_stopped = jnp.concatenate([jnp.zeros((1,), bool), stopped_inc[:-1]])
        prev_stopped = jnp.where(is_first_seg, False, prev_stopped)
        stop_mask = (seen_before > 0) | prev_stopped[:, None]
        ray_stopped = stopped_inc
    else:
        stop_mask = None
        ray_stopped = jnp.zeros((B,), bool)

    # --- end voxel records --------------------------------------------------
    # Reference: the end voxel is excluded from the walk and gets either the
    # sample (hit) update or, for clipped/as-free rays, a miss update
    # (ohm/RayMapperOccupancy.cpp:222-233).  Broken-segment continuations get
    # neither (ohmgpu/gpu/AdjustOccupancy.cl:14-18).
    end_flat, end_missed = _resolve_slots(b["end_abs"], b.get("rmin"), b.get("corner_slots"), cfg, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
    end_is_hit = b["is_sample"] & ray_valid & ~ray_stopped
    end_is_miss = b["end_as_miss"] & ray_valid & ~ray_stopped
    if flags & RayFlag.EXCLUDE_SAMPLE:
        end_is_hit = jnp.zeros_like(end_is_hit)
    if flags & RayFlag.EXCLUDE_RAY:
        end_is_miss = jnp.zeros_like(end_is_miss)
    end_active = end_is_hit | end_is_miss
    end_flat_masked = jnp.where(end_active, end_flat, cfg.sentinel)

    # --- occupancy + traversal aggregation ----------------------------------
    walk_is_miss = rec_valid if stop_mask is None else (rec_valid & ~stop_mask)
    ids = jnp.concatenate([walk_flat.reshape(-1), end_flat_masked])
    hit_w = jnp.concatenate(
        [jnp.zeros((B * S,), jnp.float32), end_is_hit.astype(jnp.float32)]
    )
    miss_w = jnp.concatenate(
        [walk_is_miss.reshape(-1).astype(jnp.float32), end_is_miss.astype(jnp.float32)]
    )
    payload_list = [(hit_w, "sum"), (miss_w, "sum")]

    if cfg.with_traversal:
        walk_trav = jnp.where(rec_valid, walk["exits"] - walk["enters"], 0.0)
        # Sample-voxel traversal: length - enter(end voxel)
        # (ohm/RayMapperOccupancy.cpp:304-311).
        end_trav = jnp.where(end_active, b["length"] - walk["end_enter"], 0.0)
        trav = jnp.concatenate([walk_trav.reshape(-1), end_trav]).astype(jnp.float32)
        payload_list.append((trav, "sum"))

    # One multi-operand sort moves the payloads with the keys (cheaper than
    # argsort + gathers on TPU).
    sorted_all = jax.lax.sort((ids,) + tuple(p for p, _ in payload_list), num_keys=1)
    ids_sorted = sorted_all[0]
    payloads = [(sorted_all[1 + i], mode) for i, (_, mode) in enumerate(payload_list)]

    last, reduced = _segment_reduce(ids_sorted, payloads, cfg)
    n_hit, n_miss = reduced[0], reduced[1]

    arena = dict(arena)
    arena["occupancy"], new_trav, dense_dropped = _apply_occupancy_dense(
        arena["occupancy"], ids_sorted, last, n_hit, n_miss, cfg,
        trav=reduced[2] if cfg.with_traversal else None,
        traversal_arena=arena.get("traversal") if cfg.with_traversal else None)
    if cfg.with_traversal:
        arena["traversal"] = new_trav

    # --- sample-only layers (mean / touch time / incident normal) -----------
    if cfg.with_mean or cfg.with_touch_time or cfg.with_incident:
        s_ids = jnp.where(end_is_hit, end_flat, cfg.sentinel)
        s_payload_list = [(end_is_hit.astype(jnp.float32), "sum")]
        if cfg.with_mean:
            local_sum = jnp.where(end_is_hit[:, None], b["end_frac"], 0.0)
            s_payload_list.append((local_sum.astype(jnp.float32), "sum"))
        if cfg.with_touch_time:
            s_payload_list.append((jnp.where(end_is_hit, b["touch_enc"], 0).astype(jnp.uint32), "max"))
        if cfg.with_incident:
            inc = jnp.where(end_is_hit[:, None], -b["direction"], 0.0)  # unit sample->sensor
            s_payload_list.append((inc.astype(jnp.float32), "sum"))

        flat_ops = [s_ids]
        widths = []
        for p_, _ in s_payload_list:
            if p_.ndim == 1:
                flat_ops.append(p_)
                widths.append(None)
            else:
                for c in range(p_.shape[1]):
                    flat_ops.append(p_[:, c])
                widths.append(p_.shape[1])
        sorted_s = jax.lax.sort(tuple(flat_ops), num_keys=1)
        s_sorted = sorted_s[0]
        rebuilt = []
        j = 1
        for (p_, mode), w in zip(s_payload_list, widths):
            if w is None:
                rebuilt.append((sorted_s[j], mode))
                j += 1
            else:
                rebuilt.append((jnp.stack(sorted_s[j:j + w], axis=-1), mode))
                j += w

        s_last, s_reduced = _segment_reduce(s_sorted, rebuilt, cfg)
        s_idx = _unique_scatter_indices(s_sorted, s_last, cfg)
        k = s_reduced[0]
        active = s_last & (k > 0) & (s_sorted != cfg.sentinel)
        i = 1
        if cfg.with_mean:
            local_sums = s_reduced[i]
            i += 1
            old_coord = arena["mean_coord"][s_sorted]
            old_count = arena["mean_count"][s_sorted].astype(jnp.float32)
            old_mean = subvoxel_jnp.sub_voxel_to_local_coord(old_coord, cfg.resolution)
            denom = jnp.maximum(old_count + k, 1.0)
            new_mean = (old_mean * old_count[:, None] + local_sums) / denom[:, None]
            new_coord = jnp.where(active, subvoxel_jnp.sub_voxel_coord(new_mean, cfg.resolution), old_coord)
            new_count = jnp.where(active, arena["mean_count"][s_sorted] + k.astype(jnp.uint32), jnp.uint32(0))
            new_coord = jnp.where(s_last, new_coord, jnp.uint32(0))
            arena["mean_coord"] = arena["mean_coord"].at[s_idx].set(new_coord, unique_indices=True)
            arena["mean_count"] = arena["mean_count"].at[s_idx].set(new_count, unique_indices=True)
        if cfg.with_touch_time:
            touch_max = s_reduced[i]
            i += 1
            old_touch = arena["touch_time"][s_sorted]
            new_touch = jnp.where(active, touch_max, old_touch)
            new_touch = jnp.where(s_last, new_touch, jnp.uint32(0))
            arena["touch_time"] = arena["touch_time"].at[s_idx].set(new_touch, unique_indices=True)
        if cfg.with_incident:
            inc_sums = s_reduced[i]
            i += 1
            old_packed = arena["incident"][s_sorted]
            old_normal = subvoxel_jnp.decode_normal(old_packed)
            has_old = jnp.any(old_normal != 0, axis=-1)
            # Weight by prior sample count (mean layer count before this batch
            # when available) — reference seeds updateIncidentNormal from the
            # mean layer count (ohm/RayMapperOccupancy.cpp:283-325).
            if cfg.with_mean:
                prior = jnp.maximum(arena["mean_count"][s_sorted].astype(jnp.float32) - k, 0.0)
            else:
                prior = jnp.zeros_like(k)
            w = jnp.where(has_old, prior, 0.0)
            merged = old_normal * w[:, None] + inc_sums
            norm = jnp.sqrt(jnp.sum(merged * merged, axis=-1))
            unit = jnp.where(norm[:, None] > 1e-6, merged / jnp.maximum(norm, 1e-12)[:, None], 0.0)
            new_packed = jnp.where(active, subvoxel_jnp.encode_normal(unit), old_packed)
            new_packed = jnp.where(s_last, new_packed, jnp.uint32(0))
            arena["incident"] = arena["incident"].at[s_idx].set(new_packed, unique_indices=True)

    missed_updates = (
        jnp.sum(jnp.where(rec_valid & walk_missed, 1, 0))
        + jnp.sum(jnp.where(end_active & end_missed, 1, 0))
    ).astype(jnp.int32)
    # Records applied locally.  Single-device: applied + missed == active and
    # missed must be 0.  Sharded: non-owned records intentionally miss, and
    # the invariant becomes sum_over_shards(applied) == active (each record
    # applied on exactly one shard) — see parallel.sharded.
    applied_updates = (
        jnp.sum(jnp.where(rec_valid & ~walk_missed, 1, 0))
        + jnp.sum(jnp.where(end_active & ~end_missed, 1, 0))
    ).astype(jnp.int32)

    stats = {
        "missed_updates": missed_updates,
        "applied_updates": applied_updates,
        "overflow": (jnp.sum(jnp.where(walk["overflow"] & ray_valid, 1, 0))
                     + walk["truncated"]).astype(jnp.int32),
        "touched": jnp.sum((last & (ids_sorted != cfg.sentinel)).astype(jnp.int32)),
        "dropped_updates": dense_dropped,
    }
    return arena, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))
def integrate_occupancy_jit(arena, batch, cfg: IntegrateConfig):
    return integrate_occupancy(arena, batch, cfg)


# --------------------------------------------------------------------------- #
# Split-phase variant: two smaller XLA programs instead of one monolith.
# The remote TPU compile service handles small programs far more reliably
# (and persists them in the compilation cache, which silently fails for the
# monolithic program), at identical warm cost — intermediates stay in HBM.
# Used by TpuRayMapper for flag sets without state-dependent masking.


def expand_records(batch, cfg: IntegrateConfig):
    """Phase 1: DDA expand + slot resolve -> packed sort keys (+ payloads)."""
    from ohm_tpu.ops.ddawalk import walk_rays_unordered

    flags = cfg.ray_flags
    b = _unpack_batch(batch, cfg)
    use_xk = bool(cfg.pallas_expand and cfg.unordered_walk and cfg.group_cap
                  and not (flags & RayFlag.EXCLUDE_RAY))
    if use_xk:
        from ohm_tpu.ops import expand_pallas
        use_xk = expand_pallas.expand_eligible(cfg, b)
    ray_valid = b["valid"]
    if use_xk:
        # Fused expand kernel: walk + resolve + validity masking in one
        # Pallas call, bit-identical to the XLA chain below.
        walk_flat, walk_trav2d, xaux = expand_pallas.expand_keys(
            b, cfg, exclude_origin=bool(flags & RayFlag.EXCLUDE_ORIGIN),
            with_trav=cfg.with_traversal, interpret=cfg.pallas_expand == 2)
        B, S = walk_flat.shape
        walk_missed_n = xaux["missed_n"]
        walk_overflow = xaux["overflow"]
        end_enter = xaux["end_enter"]
        truncated = jnp.int32(0)
        rec_valid = None
    else:
        if cfg.unordered_walk and cfg.group_cap:
            walk = walk_rays_unordered(
                b["start_abs"], b["end_abs"], b["start_frac"],
                b["direction"], b["length"], cfg.resolution, cfg.max_steps)
        else:
            walk = walk_rays(
                b["start_abs"], b["end_abs"], b["start_frac"],
                b["direction"], b["length"], cfg.resolution, cfg.max_steps,
                total_cap=cfg.walk_cap or None,
            )
        B, S = walk["valid"].shape
        rec_valid = walk["valid"] & ray_valid[:, None]
        if flags & RayFlag.EXCLUDE_ORIGIN:
            first = walk.get("first")
            if first is None:
                first = jnp.concatenate([jnp.ones((B, 1), bool), jnp.zeros((B, S - 1), bool)], axis=1)
            rec_valid = rec_valid & ~(first & b["exclude_start"][:, None])
        if flags & RayFlag.EXCLUDE_RAY:
            rec_valid = jnp.zeros_like(rec_valid)

        walk_flat, walk_missed = _resolve_slots(walk["voxels"], b.get("rmin"), b.get("corner_slots"), cfg, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        walk_flat = jnp.where(rec_valid, walk_flat, cfg.sentinel)
        walk_missed_n = jnp.sum(jnp.where(rec_valid & walk_missed, 1, 0)).astype(jnp.int32)
        walk_overflow = walk["overflow"]
        end_enter = walk["end_enter"]
        truncated = walk["truncated"]
        if cfg.with_traversal:
            walk_trav2d = jnp.where(rec_valid, walk["exits"] - walk["enters"], 0.0)
    end_flat, end_missed = _resolve_slots(b["end_abs"], b.get("rmin"), b.get("corner_slots"), cfg, tcand=b.get("tcand"), gmeta=b.get("gmeta"))
    end_is_hit = b["is_sample"] & ray_valid
    end_is_miss = b["end_as_miss"] & ray_valid
    if flags & RayFlag.EXCLUDE_SAMPLE:
        end_is_hit = jnp.zeros_like(end_is_hit)
    if flags & RayFlag.EXCLUDE_RAY:
        end_is_miss = jnp.zeros_like(end_is_miss)
    end_active = end_is_hit | end_is_miss

    walk_keys = walk_flat.reshape(-1) << 1
    walk_trav = None
    if cfg.with_traversal:
        walk_trav = walk_trav2d.reshape(-1)
    compaction_dropped = jnp.int32(0)
    row_lasts_max = jnp.int32(-1)  # only meaningful under group compaction

    G = cfg.group_size
    if cfg.group_cap and B % G == 0 and cfg.group_cap < G * S:
        # Group compaction: sentinel keys sort to the back of each row, so
        # truncating at group_cap removes only padding (host guarantees the
        # cap covers the exact per-group crossing count).
        rows = group_rows(walk_keys, B, S, G)
        n_valid = jnp.sum(jnp.where(rows < (cfg.sentinel << 1), 1, 0))
        if cfg.with_traversal:
            tr = group_rows(walk_trav, B, S, G)
            rows, tr = jax.lax.sort((rows, tr), num_keys=1, dimension=1)
            tr = tr[:, :cfg.group_cap]
            walk_trav = tr.reshape(-1)
        else:
            rows = jax.lax.sort((rows,), num_keys=1, dimension=1)[0]
        rows = rows[:, :cfg.group_cap]
        n_kept = jnp.sum(jnp.where(rows < (cfg.sentinel << 1), 1, 0))
        compaction_dropped = (n_valid - n_kept).astype(jnp.int32)
        # Per-row unique-voxel high-water mark: sizes the fused row-local
        # apply's row_cap (apply_records_fused_jit) the same way 'touched'
        # sizes scatter_cap — rows are sorted, so uniques = in-row lasts.
        ids_r = rows >> 1
        last_r = jnp.concatenate(
            [ids_r[:, 1:] != ids_r[:, :-1],
             jnp.ones((ids_r.shape[0], 1), bool)], axis=1)
        row_lasts_max = jnp.max(jnp.sum(
            (last_r & (ids_r != cfg.sentinel)).astype(jnp.int32), axis=1))
        walk_keys = rows.reshape(-1)

    key = jnp.concatenate([
        walk_keys,
        (jnp.where(end_active, end_flat, cfg.sentinel) << 1) | end_is_hit.astype(jnp.int32),
    ])
    out = {"key": key, "end_flat": end_flat, "end_is_hit": end_is_hit}
    if cfg.with_traversal:
        end_trav = jnp.where(end_active, b["length"] - end_enter, 0.0)
        out["trav"] = jnp.concatenate([walk_trav, end_trav]).astype(jnp.float32)
    stats = {
        "missed_updates": (walk_missed_n
                           + jnp.sum(jnp.where(end_active & end_missed, 1, 0))).astype(jnp.int32),
        "overflow": (jnp.sum(jnp.where(walk_overflow & ray_valid, 1, 0))
                     + truncated).astype(jnp.int32),
        "compaction_dropped": compaction_dropped,
        "row_lasts_max": row_lasts_max,
    }
    return out, stats


expand_records_jit = functools.partial(
    jax.jit, static_argnames=("cfg",))(expand_records)


def sorted_hit_miss_counts(key_s):
    """Per-voxel hit/miss counts from a SORTED (flat<<1|hit) key stream.

    Counts come from POSITION DIFFERENCES: each voxel's records order
    [misses, hits], and the voxel/run start positions — propagated to the
    run ends by two blocked cummaxes (ops.blocked, ~0.33 ns/elem) — yield
    both counts at the voxel-last record.  Replaces lax.associative_scan,
    which cost ~11 ms at 2M records (scripts/probe_apply7.py stage 4).

    Returns (ids, voxel_first, voxel_last, n_hit, n_miss); counts are f32
    and meaningful at voxel-last positions.
    """
    from ohm_tpu.ops import blocked

    ids_s = key_s >> 1
    hit_b = key_s & 1
    n = key_s.shape[0]
    first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
    run_first = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    neg = jnp.int32(-(1 << 30))
    p_vox = blocked.cummax(jnp.where(first, pos, neg), lowest=neg)
    p_run = blocked.cummax(jnp.where(run_first, pos, neg), lowest=neg)
    n_hit = jnp.where(hit_b == 1, pos - p_run + 1, 0).astype(jnp.float32)
    n_miss = jnp.where(hit_b == 1, p_run - p_vox, pos - p_vox + 1).astype(jnp.float32)
    return ids_s, first, last, n_hit, n_miss


def sorted_nonneg_sums(vals_s, first):
    """Segment sums over a sorted stream, valid at segment lasts.

    Row-local blocked segmented sum (ops.blocked.segment_sums): the earlier
    global-cumsum-minus-propagated-base form cancelled ~1e5-magnitude f32
    prefixes at 2M records, losing ~0.01-0.03 absolute per segment — rivaling
    one record's traversal.  Error now scales with the segment magnitude."""
    from ohm_tpu.ops import blocked

    return blocked.segment_sums(vals_s, first)


def apply_records(arena, records, batch, cfg: IntegrateConfig):
    """Phase 2: sort + blocked position-diff reduce + scatter + dense apply.

    Per-voxel counts come from POSITION DIFFERENCES after the single-key
    sort: the key packs (flat << 1 | hit), so each voxel's records order
    [misses, hits] and the voxel/run start positions — propagated to the run
    ends by two blocked cummaxes (ops.blocked, ~0.33 ns/elem) — yield both
    counts at the voxel-last record.  This replaces the round-1
    lax.associative_scan, which cost ~11 ms at 2M records (half the apply
    budget; scripts/probe_apply7.py stage 4).
    """
    from ohm_tpu.ops import blocked

    key = records["key"]
    operands = (key,) + ((records["trav"],) if cfg.with_traversal else ())
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    key_s = sorted_ops[0]

    if cfg.pallas_deposit and not cfg.with_traversal:
        from ohm_tpu.ops import deposit_pallas

        if deposit_pallas.deposit_ok(cfg):
            arena = dict(arena)
            arena["occupancy"], touched = deposit_pallas.deposit_and_sweep(
                arena["occupancy"], key_s, cfg,
                interpret=cfg.pallas_deposit == 2)
            if cfg.with_mean or cfg.with_touch_time or cfg.with_incident:
                arena = _apply_sample_layers(arena, records, batch, cfg)
            return arena, touched, jnp.int32(0)

    ids_s, first, last, n_hit, n_miss = sorted_hit_miss_counts(key_s)

    trav_tot = None
    if cfg.with_traversal:
        trav_tot = sorted_nonneg_sums(sorted_ops[1], first)

    arena = dict(arena)
    arena["occupancy"], new_trav, dropped = _apply_occupancy_dense(
        arena["occupancy"], ids_s, last, n_hit, n_miss, cfg,
        trav=trav_tot, traversal_arena=arena.get("traversal") if cfg.with_traversal else None)
    if cfg.with_traversal:
        arena["traversal"] = new_trav

    # Sample-only layers reuse the batch's end records (B-sized streams).
    if cfg.with_mean or cfg.with_touch_time or cfg.with_incident:
        arena = _apply_sample_layers(arena, records, batch, cfg)

    touched = jnp.sum((last & (ids_s != cfg.sentinel)).astype(jnp.int32))
    return arena, touched, dropped


apply_records_jit = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))(apply_records)


def apply_records_fused(arena, records, batch, cfg: IntegrateConfig):
    """Phase 2, two-level row-local variant: no full-stream global sort.

    Exploits the structure expand_records_jit already produces under group
    compaction: the walk stream is [R, group_cap] rows, EACH ROW SORTED
    (the compaction row-sort), with same-voxel records contiguous within a
    row.  Level 1 (row-local): per-row run-length counts via one blocked
    cummax (forced resets at row starts), per-row voxel-lasts compacted
    into [R, row_cap] by a single ROW sort — bitonic depth log^2(group_cap)
    instead of log^2(N), and downstream work shrinks to the unique-per-row
    voxel count (~5x at bench shapes).  Level 2 (global, small): the
    compacted (voxel, partial-count) entries merge with the raw END records
    (each a single-count entry) in ONE small sort; f32 segment sums combine
    the partial hit/miss counts exactly (integer-valued, < 2^24), and one
    unique-index scatter deposits the packed totals for the dense sweep.

    The occupancy sweep math is linear in the per-voxel hit/miss counts
    (total = n_hit*hit_eff + n_miss*miss_eff), which is what makes partial
    counts per row legal — clamping/saturation/exclusion apply once in the
    dense sweep over batch-start state, so occupancy is BIT-IDENTICAL to
    the split-phase pipeline; traversal differs only by f32 reassociation.

    Count-width guard: packed counts are 16+16 bits and per-voxel totals are
    bounded by one record per segment per voxel (walk) + one end record per
    segment, so callers gate this path at <= 16384 segments (TpuRayMapper).

    Requires cfg.group_cap > 0 (rows exist) and cfg.row_cap > 0 (sized like
    scatter_cap from the 'row_lasts_max' expand stat); over-budget rows drop
    their highest-address voxels into the dropped count (validate asserts).
    """
    from ohm_tpu.ops import blocked

    key = records["key"]
    n_end = records["end_flat"].shape[0]
    n_walk = key.shape[0] - n_end
    cap = cfg.group_cap
    cap2 = cfg.row_cap
    if cap <= 0 or cap2 <= 0 or n_walk % cap:
        raise ValueError("fused apply requires group-compacted rows and row_cap > 0")
    if cap >= 1 << 16:
        raise ValueError("group_cap must fit 16-bit per-row run counts")
    R = n_walk // cap
    # Clamp the per-row window so the level-2 stream always fits the scratch
    # tail — drop-escalation may double row_cap unboundedly, and a too-small
    # window degrades to counted drops, not a crash.
    cap2 = min(cap2, cap, max(1, (cfg.scatter_pad - n_end) // R))
    sent = jnp.int32(cfg.sentinel)

    # --- level 1: per-row partials, compacted into [R, row_cap] -----------
    rows = key[:n_walk].reshape(R, cap)
    ids2 = rows >> 1  # hit bit is 0 on all walk records
    trav_w = records["trav"][:n_walk] if cfg.with_traversal else None
    kc, pc, tc, dropped = _fused_row_partials(ids2, None, trav_w, cap2, cfg)

    # --- level 2: merge row partials + raw end records in one small sort --
    ek = key[n_walk:]
    ids_e = ek >> 1
    hit_e = (ek & 1).astype(jnp.uint32)
    real_e = ids_e != sent
    packed_e = jnp.where(real_e, (hit_e << 16) | (1 - hit_e), jnp.uint32(0))
    trav_e = (jnp.where(real_e, records["trav"][n_walk:], 0.0)
              if cfg.with_traversal else None)
    pending, idx, real_last, trav_tot = _fused_merge_deposit(
        arena["occupancy"].shape, kc, pc, tc, ids_e, packed_e, trav_e, cfg)

    arena = dict(arena)
    arena["occupancy"] = _occupancy_sweep(arena["occupancy"], pending, cfg)
    if cfg.with_traversal:
        arena["traversal"] = arena["traversal"].at[idx].add(
            jnp.where(real_last, trav_tot, 0.0), unique_indices=True,
            mode="promise_in_bounds")

    if cfg.with_mean or cfg.with_touch_time or cfg.with_incident:
        arena = _apply_sample_layers(arena, records, batch, cfg)

    touched = jnp.sum(real_last.astype(jnp.int32))
    return arena, touched, dropped


apply_records_fused_jit = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))(apply_records_fused)


def integrate_chain(arena, rayw_stack, cfg: IntegrateConfig, k: int):
    """Chain ``k`` same-shape rayflow batches through expand + apply inside
    ONE compiled program, threading the arena state batch to batch.

    Motivation (scripts/probe_wall.py, round 4): each dispatch RPC through
    the axon tunnel costs ~5 ms wall — split-phase pays 2.25 dispatches per
    batch (~10 of its 16.8 ms device-only time), so chaining K batches into
    one dispatch amortises that to 1/K.  The math is the exact split-phase
    (or fused, when cfg.row_cap > 0) pipeline applied sequentially; results
    are bit-identical to K separate dispatches of the same programs.

    ``rayw_stack`` is the coalesced-transfer stack u8[k, L] the worker
    already ships (TpuRayMapper._integrate_group); all k batches must share
    one cfg (the mapper's monotone caps make group members converge).
    Stats are summed over the chain (max for row_lasts_max/touched, which
    size windows and are only meaningful pre-sizing — the mapper engages the
    chain only after sizing).
    """
    stats_acc = None
    for i in range(k):
        batch = {"rayw": rayw_stack[i]}
        records, st = expand_records(batch, cfg)
        if cfg.row_cap > 0:
            arena, touched, dropped = apply_records_fused(arena, records, batch, cfg)
        else:
            arena, touched, dropped = apply_records(arena, records, batch, cfg)
        st = dict(st)
        st["touched"] = touched
        st["dropped_updates"] = dropped
        if stats_acc is None:
            stats_acc = st
        else:
            stats_acc = {
                name: (jnp.maximum(stats_acc[name], v)
                       if name in ("row_lasts_max", "touched")
                       else stats_acc[name] + v)
                for name, v in st.items()
            }
    return arena, stats_acc


integrate_chain_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "k"), donate_argnames=("arena",))(integrate_chain)


def _fused_row_partials(ids2, weight_f, trav_f, cap2, cfg):
    """Fused-apply level 1: per-row partial miss counts + traversal sums at
    in-row voxel-lasts, compacted into [R, cap2] by one row sort.

    ids2 [R, cap] must be row-sorted (the expand compaction guarantees it);
    weight_f/trav_f are flattened [R*cap] aligned with ids2 (weight 1.0 per
    counted record — callers mask records that must not count, e.g. the NDT
    pipeline's Gaussian-handled misses; None means every real record counts,
    computed as run lengths by ONE position cummax instead of the heavier
    segment sum).  Partial counts are exact integer sums in f32 (< 2^24).
    Returns (kc, pc(u32 miss counts), tc|None, dropped) where dropped counts
    voxel-lasts lost to the cap2 truncation.
    """
    from ohm_tpu.ops import blocked

    R, cap = ids2.shape
    if cap >= 1 << 16:
        # Per-row counts pack into the low 16 bits of the merge entries; a
        # row wider than 65535 records could overflow a single voxel's
        # count into the hit half (silently, on the NDT path — review
        # finding).  Callers must fall back to the unfused deposit.
        raise ValueError("fused row width must fit 16-bit per-row run counts")
    sent = jnp.int32(cfg.sentinel)
    first2 = jnp.concatenate(
        [jnp.ones((R, 1), bool), ids2[:, 1:] != ids2[:, :-1]], axis=1)
    last2 = jnp.concatenate(
        [ids2[:, 1:] != ids2[:, :-1], jnp.ones((R, 1), bool)], axis=1)
    real_last2 = last2 & (ids2 != sent)
    first_f = first2.reshape(-1)

    if weight_f is None:
        n = R * cap
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        neg = jnp.int32(-(1 << 30))
        p_first = blocked.cummax(jnp.where(first_f, pos, neg), lowest=neg)
        cnt = (pos - p_first + 1).reshape(R, cap).astype(jnp.float32)
    else:
        cnt = blocked.segment_sums(weight_f, first_f).reshape(R, cap)
    packed_w = jnp.where(real_last2, cnt.astype(jnp.uint32), jnp.uint32(0))
    trav_w2 = None
    if trav_f is not None:
        trav_sums = blocked.segment_sums(trav_f, first_f)
        trav_w2 = jnp.where(real_last2, trav_sums.reshape(R, cap), 0.0)

    key2 = jnp.where(real_last2, ids2, sent)
    ops_w = (key2, packed_w) + ((trav_w2,) if trav_f is not None else ())
    sorted_w = jax.lax.sort(ops_w, num_keys=1, dimension=1)
    kc = sorted_w[0][:, :cap2]
    pc = sorted_w[1][:, :cap2]
    realc = kc != sent
    pc = jnp.where(realc, pc, jnp.uint32(0))
    tc = (jnp.where(realc, sorted_w[2][:, :cap2], 0.0)
          if trav_f is not None else None)
    dropped = (jnp.sum(real_last2.astype(jnp.int32))
               - jnp.sum(realc.astype(jnp.int32)))
    return kc, pc, tc, dropped


def _fused_merge_deposit(shape, kc, pc, tc, ids_e, packed_e, trav_e, cfg):
    """Fused-apply level 2: one SMALL global sort over the compacted row
    partials + per-end-record entries, exact f32 segment sums of the packed
    (hit << 16 | miss) partials, and a unique-index scatter of the totals
    into a fresh packed pending plane.

    Returns (pending u32 plane, scatter idx, real_last mask, trav totals) —
    idx/real_last/trav align with the sorted merge stream so callers can
    scatter additional per-voxel payloads (traversal) at the same targets.
    """
    from ohm_tpu.ops import blocked

    sent = jnp.int32(cfg.sentinel)
    ids_m = jnp.concatenate([kc.reshape(-1), ids_e])
    packed_m = jnp.concatenate([pc.reshape(-1), packed_e])
    M = ids_m.shape[0]
    if M > cfg.scatter_pad:
        raise ValueError(f"fused merge stream {M} exceeds scatter_pad {cfg.scatter_pad}")
    ops_m = (ids_m, packed_m)
    if trav_e is not None:
        ops_m += (jnp.concatenate([tc.reshape(-1), trav_e]),)
    sorted_m = jax.lax.sort(ops_m, num_keys=1)
    ids_s = sorted_m[0]
    first_s = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    last_s = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
    # Partial hit/miss sums combine exactly in f32 (integer-valued < 2^24).
    h_tot = blocked.segment_sums((sorted_m[1] >> 16).astype(jnp.float32), first_s)
    m_tot = blocked.segment_sums((sorted_m[1] & jnp.uint32(0xFFFF)).astype(jnp.float32), first_s)
    capf = jnp.float32(65535.0)
    packed = (jnp.minimum(h_tot, capf).astype(jnp.uint32) << 16) \
        | jnp.minimum(m_tot, capf).astype(jnp.uint32)
    real_last = last_s & (ids_s != sent)
    packed = jnp.where(real_last, packed, jnp.uint32(0))
    mpos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).squeeze(-1)
    idx = jnp.where(real_last, ids_s, cfg.pad_base + mpos)
    pending = jnp.zeros(shape, jnp.uint32).at[idx].set(
        packed, unique_indices=True, mode="promise_in_bounds")
    trav_tot = blocked.segment_sums(sorted_m[2], first_s) if trav_e is not None else None
    return pending, idx, real_last, trav_tot


def _apply_sample_layers(arena, records, batch, cfg: IntegrateConfig):
    """Mean / touch-time / incident-normal updates from the batch's sample
    (end-voxel hit) records — B-sized streams, shared by the split-phase and
    delta pipelines (reference: ohm/RayMapperOccupancy.cpp:283-325)."""
    if True:
        b = _unpack_batch(batch, cfg)
        end_is_hit = records["end_is_hit"]
        end_flat = records["end_flat"]
        s_ids = jnp.where(end_is_hit, end_flat, cfg.sentinel)
        flat_ops = [s_ids, end_is_hit.astype(jnp.float32)]
        if cfg.with_mean:
            z = jnp.where(end_is_hit[:, None], b["end_frac"], 0.0)
            flat_ops += [z[:, c] for c in range(3)]
        if cfg.with_touch_time:
            flat_ops.append(jnp.where(end_is_hit, b["touch_enc"], 0).astype(jnp.uint32))
        if cfg.with_incident:
            inc = jnp.where(end_is_hit[:, None], -b["direction"], 0.0)
            flat_ops += [inc[:, c] for c in range(3)]
        sorted_s = jax.lax.sort(tuple(flat_ops), num_keys=1)
        s_sorted = sorted_s[0]
        payloads = [(sorted_s[1], "sum")]
        j = 2
        if cfg.with_mean:
            payloads += [(sorted_s[j + c], "sum") for c in range(3)]
            j += 3
        if cfg.with_touch_time:
            payloads.append((sorted_s[j], "max"))
            j += 1
        if cfg.with_incident:
            payloads += [(sorted_s[j + c], "sum") for c in range(3)]
            j += 3
        s_last, s_red = _segment_reduce(s_sorted, payloads, cfg)
        s_idx = _unique_scatter_indices(s_sorted, s_last, cfg)
        k = s_red[0]
        active = s_last & (k > 0) & (s_sorted != cfg.sentinel)
        i = 1
        if cfg.with_mean:
            local_sums = jnp.stack(s_red[i:i + 3], axis=-1)
            i += 3
            old_coord = arena["mean_coord"][s_sorted]
            old_count = arena["mean_count"][s_sorted].astype(jnp.float32)
            old_mean = subvoxel_jnp.sub_voxel_to_local_coord(old_coord, cfg.resolution)
            denom = jnp.maximum(old_count + k, 1.0)
            new_mean = (old_mean * old_count[:, None] + local_sums) / denom[:, None]
            new_coord = jnp.where(active, subvoxel_jnp.sub_voxel_coord(new_mean, cfg.resolution), old_coord)
            new_count = jnp.where(active, arena["mean_count"][s_sorted] + k.astype(jnp.uint32), jnp.uint32(0))
            new_coord = jnp.where(s_last, new_coord, jnp.uint32(0))
            arena["mean_coord"] = arena["mean_coord"].at[s_idx].set(new_coord, unique_indices=True)
            arena["mean_count"] = arena["mean_count"].at[s_idx].set(new_count, unique_indices=True)
        if cfg.with_touch_time:
            touch_max = s_red[i]
            i += 1
            old_touch = arena["touch_time"][s_sorted]
            new_touch = jnp.where(active, touch_max, old_touch)
            arena["touch_time"] = arena["touch_time"].at[s_idx].set(
                jnp.where(s_last, new_touch, jnp.uint32(0)), unique_indices=True)
        if cfg.with_incident:
            inc_sums = jnp.stack(s_red[i:i + 3], axis=-1)
            i += 3
            old_packed = arena["incident"][s_sorted]
            old_normal = subvoxel_jnp.decode_normal(old_packed)
            has_old = jnp.any(old_normal != 0, axis=-1)
            if cfg.with_mean:
                prior = jnp.maximum(arena["mean_count"][s_sorted].astype(jnp.float32) - k, 0.0)
            else:
                prior = jnp.zeros_like(k)
            w = jnp.where(has_old, prior, 0.0)
            merged = old_normal * w[:, None] + inc_sums
            norm = jnp.sqrt(jnp.sum(merged * merged, axis=-1))
            unit = jnp.where(norm[:, None] > 1e-6, merged / jnp.maximum(norm, 1e-12)[:, None], 0.0)
            new_packed = jnp.where(active, subvoxel_jnp.encode_normal(unit), old_packed)
            arena["incident"] = arena["incident"].at[s_idx].set(
                jnp.where(s_last, new_packed, jnp.uint32(0)), unique_indices=True)
    return arena


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("arena",))
def apply_samples_jit(arena, records, batch, cfg: IntegrateConfig):
    return _apply_sample_layers(arena, records, batch, cfg)


# --------------------------------------------------------------------------- #
# Delta fast path ("v3"): sort + blocked-cummax reduce + compaction sort +
# one sorted-unique scatter-add + unconditional clamp.
#
# Motivation (all slope-measured on the v5e chip, scripts/probe_apply*.py):
# the round-1 apply phase spent ~11 ms in lax.associative_scan and ~11-27 ms
# in a 2M-record scatter; sorted+unique scatters cost ~5.8 ns/element and
# gathers ~19-25 ns/element, while 1D single-key sorts cost ~1.4-2.3 ns/elem
# and blocked cummax ~0.33 ns/elem.  This path therefore:
#   1. sorts the (flat<<1|hit) record keys (i32),
#   2. reduces per-voxel hit/miss counts from POSITION DIFFERENCES — the
#      voxel/run start positions propagate to the run ends via two blocked
#      cummaxes (ops.blocked), no scan,
#   3. compacts (voxel, delta) pairs to the stream front with one i64
#      single-key sort (delta bits ride in the key's low word),
#   4. scatter-ADDs the deltas at sorted unique indices.  The arena encodes
#      unobserved as -0.0 so no old-value gather is needed: -0.0 + x == x,
#      and -0.0 + +0.0 == +0.0 marks "observed, value 0" correctly,
#   5. clamps the whole arena unconditionally — equivalent to the
#      reference's one-sided per-update clamp (ohm/VoxelOccupancyCompute.h
#      occupancyAdjustUp/Down) because every stored value is inside
#      [min_value, max_value] inductively and 0 (the unobserved base) is
#      strictly inside, so the inactive side's bound can never engage.
#
# Validity gate (TpuRayMapper routes here only when):
#   - no state-dependent ray flags (kRfExclude{Free,Occupied,Unobserved},
#     kRfStopOnFirstOccupied) — hit/miss adjustments are then constants,
#   - saturation disabled (the reference default),
#   - min_value < 0 < max_value (guards the clamp-equivalence argument and
#     keeps jnp.minimum/maximum from touching the -0.0 sentinel).
# Everything else falls back to the monolithic/split-phase pipelines above.


def apply_delta(occupancy, key, cfg: IntegrateConfig):
    """Occupancy delta apply: see module comment.  i64 math inside — callers
    must trace under jax.enable_x64(True) (TpuRayMapper does)."""
    from ohm_tpu.ops import blocked

    n = key.shape[0]
    s = jax.lax.sort((key,), num_keys=1)[0]
    ids = s >> 1
    hit = (s & 1).astype(jnp.int32)
    valid = ids < jnp.int32(cfg.sentinel)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    prev_ids = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ids[:-1]])
    prev_key = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s[:-1]])
    next_ids = jnp.concatenate([ids[1:], jnp.full((1,), -1, jnp.int32)])
    vox_first = ids != prev_ids
    run_first = s != prev_key
    vox_last = (ids != next_ids) & valid

    neg = jnp.int32(-(1 << 30))
    p_vox = blocked.cummax(jnp.where(vox_first, pos, neg), lowest=neg)
    p_run = blocked.cummax(jnp.where(run_first, pos, neg), lowest=neg)

    # Sorted order within a voxel is [misses (bit 0), hits (bit 1)]; at the
    # voxel-last record the run/voxel starts give both counts directly.
    n_hit = jnp.where(hit == 1, pos - p_run + 1, 0)
    n_miss = jnp.where(hit == 1, p_run - p_vox, pos - p_vox + 1)
    delta = (n_hit.astype(jnp.float32) * jnp.float32(cfg.hit_value)
             + n_miss.astype(jnp.float32) * jnp.float32(cfg.miss_value))

    i64max = jnp.int64((1 << 62))
    delta_bits = jax.lax.bitcast_convert_type(delta, jnp.uint32).astype(jnp.int64)
    k2 = jnp.where(vox_last, (ids.astype(jnp.int64) << 32) | delta_bits, i64max)
    s2 = jax.lax.sort((k2,), num_keys=1)[0]
    cap = cfg.scatter_cap if 0 < cfg.scatter_cap < n else n
    if cap > cfg.scatter_pad:
        raise ValueError(
            f"delta path needs scatter_pad >= scatter window ({cap}); "
            f"have {cfg.scatter_pad}")
    s2c = s2[:cap]

    # Pad entries route into the arena's scratch tail (pad_base + iota):
    # in-bounds, sorted (pad_base exceeds every real id) and unique, so the
    # scatter can promise in-bounds sorted unique indices.  Out-of-bounds
    # drop-mode indices lower to a ~20x slower predicated scatter on this
    # toolchain (scripts/probe_v3.py: 279 ms vs 76 ms per batch).
    cpos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    real = s2c != i64max
    idx = jnp.where(real, (s2c >> 32).astype(jnp.int32), cfg.pad_base + cpos)
    val = jnp.where(real, jax.lax.bitcast_convert_type(
        (s2c & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32), 0.0)
    occupancy = occupancy.at[idx].add(
        val, indices_are_sorted=True, unique_indices=True,
        mode="promise_in_bounds")
    occupancy = jnp.minimum(
        jnp.maximum(occupancy, jnp.float32(cfg.min_value)), jnp.float32(cfg.max_value))

    touched = jnp.sum(vox_last.astype(jnp.int32))
    applied = jnp.sum((s2c != i64max).astype(jnp.int32))
    stats = {"touched": touched, "dropped_updates": touched - applied}
    return occupancy, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("occupancy",))
def apply_delta_jit(occupancy, key, cfg: IntegrateConfig):
    return apply_delta(occupancy, key, cfg)


def delta_path_ok(cfg: IntegrateConfig) -> bool:
    """True when the delta fast path preserves reference semantics."""
    import numpy as np

    state_flags = (RayFlag.EXCLUDE_FREE | RayFlag.EXCLUDE_OCCUPIED
                   | RayFlag.EXCLUDE_UNOBSERVED | RayFlag.STOP_ON_FIRST_OCCUPIED)
    # Saturation "disabled" is encoded as the float32 min/max
    # (core.map.OccupancyMap.saturation_min/_max), matching the reference's
    # voxel saturation defaults.
    sat_off = (cfg.saturation_min <= float(np.finfo(np.float32).min)
               and cfg.saturation_max >= float(np.finfo(np.float32).max))
    # Opt-in: the delta path only wins when a scatter budget bounds the
    # sorted scatter-add (uncapped 2M .add measured 10x worse than the
    # split-phase pad-trick .set deposit - scripts/probe_v3.py).
    return (cfg.scatter_cap > 0
            and cfg.zero_unobserved
            and not (cfg.ray_flags & state_flags)
            and not cfg.with_traversal
            and sat_off
            and cfg.min_value < 0.0 < cfg.max_value)
