"""Host-side ray batch preparation: filter, segment, quantise, localise, pack.

TPU-native equivalent of the CPU pre-pass in GpuMap::integrateRays
(ohmgpu/GpuMap.cpp:730-801): rays are filtered, long rays are split into
segments no longer than one region edge, endpoint voxel keys are computed in
float64, and geometry is re-expressed in voxel-local float32 frames (the
precision trick of GpuMap.cpp:666-676 / docs/gpu/docgpudetail.md:68-74).

Because each segment is at most one region edge long, it can touch at most a
2x2x2 box of regions; the host resolves those eight "corner" region slots
(mapping.arena allocates them) and ships them with the batch, so the device
needs no region-table lookups (see ops.integrate._resolve_slots).

Segment semantics match the reference's clipped-key convention
(ohmgpu/GpuKey.h voxel[3] marker + AdjustOccupancy.cl:14-18): a non-final
segment's end voxel receives no update — it is the next segment's start
voxel and is visited there as a miss.

The device-bound arrays are packed into four typed blocks (ints / floats /
flags / touch) to amortise per-transfer latency (layout documented in
ops.integrate).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ohm_tpu.core import keys as keymath
from ohm_tpu.core import subvoxel
from ohm_tpu.core.rayflags import RayFlag, RayFilterFlag
from ohm_tpu.ops.integrate import INTS_WIDTH, FLOATS_WIDTH, FLAGS_WIDTH


@dataclasses.dataclass
class PreparedBatch:
    """Fixed-shape packed arrays for one device integrate call."""

    size: int
    n_segments: int
    arrays: dict  # 'ints' i32[size,17], 'floats' f32[size,10], 'flags' bool[size,4], 'touch' u32[size]
    corner_regions: np.ndarray  # int32 [n_segments, 8, 3] candidate regions per segment
    region_keys: np.ndarray  # int32 [R, 3] unique regions this batch touches (superset)
    intensities: np.ndarray | None = None  # f32 [size] per segment (NDT-TM)


def _next_bucket(n: int, min_size: int = 256) -> int:
    size = min_size
    while size < n:
        size *= 2
    return size


def max_steps_for(segment_length: float, resolution: float) -> int:
    """DDA per-axis crossing cap: a segment crosses at most length/res + 1
    walls along any single axis (+ slack for boundary quantisation)."""
    return int(math.ceil(segment_length / resolution)) + 3


def prepare_ray_batch(
    map_obj,
    rays,
    timestamps=None,
    intensities=None,
    ray_update_flags: int = 0,
    segment_length: float | None = None,
    min_bucket: int = 256,
    use_native: bool | None = None,
) -> PreparedBatch:
    """Convert interleaved origin/sample rays (2N, 3) into device-ready arrays.

    Corner slots (ints[:, 9:17]) are left as -1; the caller fills them after
    region allocation (see TpuRayMapper.integrate_rays).

    The single-pass C++ implementation (ohm_tpu.native) is used when built;
    pass use_native=False to force the numpy path (used for parity tests).
    """
    rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
    starts = rays[0::2]
    ends = rays[1::2]
    n_rays = starts.shape[0]

    dims = map_obj.region_voxel_dims
    res = map_obj.resolution
    region_edge = float(dims.min()) * res
    if segment_length is None or segment_length <= 0 or segment_length > 0.999 * region_edge:
        # Cap at one region edge: guarantees each segment spans at most two
        # regions per axis (the 2x2x2 corner-slot contract).
        segment_length = 0.999 * region_edge

    if timestamps is not None:
        timestamps = np.asarray(timestamps, dtype=np.float64).reshape(-1)
        if timestamps.size:
            map_obj.update_first_ray_time(float(timestamps[0]))

    # --- filter ---------------------------------------------------------
    if map_obj.ray_filter is not None and n_rays:
        starts, ends, filter_flags, accept = map_obj.ray_filter(starts, ends)
    else:
        filter_flags = np.zeros(n_rays, dtype=np.uint32)
        accept = np.ones(n_rays, dtype=bool)

    starts = starts[accept]
    ends = ends[accept]
    filter_flags = filter_flags[accept]
    if timestamps is not None and timestamps.size == n_rays:
        timestamps = timestamps[accept]
    else:
        timestamps = None
    if intensities is not None:
        intensities = np.asarray(intensities, dtype=np.float32).reshape(-1)
        intensities = intensities[accept] if intensities.size == n_rays else None
    n_rays = starts.shape[0]

    if use_native is None:
        from ohm_tpu import native as _native

        use_native = _native.available()
    if use_native and n_rays:
        return _prepare_native(map_obj, starts, ends, filter_flags, timestamps, intensities,
                               ray_update_flags, segment_length, min_bucket)


    # --- segment --------------------------------------------------------
    delta = ends - starts
    lengths = np.linalg.norm(delta, axis=-1)
    n_seg = np.maximum(np.ceil(lengths / segment_length).astype(np.int64), 1)
    total = int(n_seg.sum())

    ray_idx = np.repeat(np.arange(n_rays), n_seg)
    seg_idx = np.arange(total) - np.repeat(np.cumsum(n_seg) - n_seg, n_seg)
    is_last = seg_idx == (n_seg[ray_idx] - 1)
    is_first = seg_idx == 0

    with np.errstate(invalid="ignore", divide="ignore"):
        unit = np.where(lengths[:, None] > 0, delta / np.maximum(lengths, 1e-300)[:, None], 0.0)
    t0 = seg_idx * segment_length
    t1 = np.where(is_last, lengths[ray_idx], (seg_idx + 1) * segment_length)
    p0 = starts[ray_idx] + unit[ray_idx] * t0[:, None]
    p1 = np.where(is_last[:, None], ends[ray_idx], starts[ray_idx] + unit[ray_idx] * t1[:, None])
    seg_len = t1 - t0

    # --- quantise (f64, reference two-step) ------------------------------
    r0, l0 = map_obj.voxel_key(p0)
    r1, l1 = map_obj.voxel_key(p1)
    start_abs = keymath.key_to_abs(r0, l0, dims)
    end_abs = keymath.key_to_abs(r1, l1, dims)
    start_centre = map_obj.voxel_centre_global(r0, l0)
    end_centre = map_obj.voxel_centre_global(r1, l1)
    start_frac = (p0 - start_centre).astype(np.float32)
    end_frac = (p1 - end_centre).astype(np.float32)

    clipped_end = (filter_flags[ray_idx] & RayFilterFlag.CLIPPED_END).astype(bool)
    end_as_free = bool(ray_update_flags & RayFlag.END_POINT_AS_FREE)
    # Reference: include_sample_in_ray = clipped_end | END_POINT_AS_FREE
    # (ohm/RayMapperOccupancy.cpp:222-224).
    sample_in_ray = clipped_end | end_as_free
    is_sample = is_last & ~sample_in_ray
    end_as_miss = is_last & sample_in_ray

    touch_enc = np.zeros(total, dtype=np.uint32)
    if timestamps is not None and map_obj.first_ray_time >= 0:
        touch_enc = subvoxel.encode_touch_time(map_obj.first_ray_time, timestamps[ray_idx]).astype(np.uint32)

    # --- corner regions (2x2x2 box per segment) --------------------------
    start_region = np.floor_divide(start_abs, dims)
    end_region = np.floor_divide(end_abs, dims)
    rmin = np.minimum(start_region, end_region).astype(np.int32)
    rmax = np.maximum(start_region, end_region).astype(np.int32)
    span = rmax - rmin  # 0 or 1 per axis by construction
    offs = np.array([[dx, dy, dz] for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], dtype=np.int32)
    # Corner order must match cidx = dx + 2*dy + 4*dz in _resolve_slots.
    offs = offs[np.argsort(offs[:, 0] + 2 * offs[:, 1] + 4 * offs[:, 2])]
    corner_regions = rmin[:, None, :] + offs[None, :, :] * np.minimum(span, 1)[:, None, :]

    # Unique regions via int64 packing (fast path for allocation).
    packed = keymath.pack_region_key(corner_regions.reshape(-1, 3))
    region_keys = keymath.unpack_region_key(np.unique(packed)).astype(np.int32)

    # --- pack to device blocks -------------------------------------------
    size = _next_bucket(total, min_bucket)
    ints = np.zeros((size, INTS_WIDTH), dtype=np.int32)
    ints[:, 9:17] = -1
    ints[:total, 0:3] = start_abs
    ints[:total, 3:6] = end_abs
    ints[:total, 6:9] = rmin

    floats = np.zeros((size, FLOATS_WIDTH), dtype=np.float32)
    floats[:total, 0:3] = start_frac
    floats[:total, 3:6] = unit[ray_idx].astype(np.float32)
    floats[:total, 6] = seg_len.astype(np.float32)
    floats[:total, 7:10] = end_frac
    floats[:total, 10] = t0.astype(np.float32)  # distance sensor -> segment start
    floats[:total, 11] = lengths[ray_idx].astype(np.float32)  # full ray length

    flags = np.zeros((size, FLAGS_WIDTH), dtype=bool)
    flags[:total, 0] = is_sample
    flags[:total, 1] = end_as_miss
    flags[:total, 2] = is_first
    flags[:total, 3] = True

    touch = np.zeros(size, dtype=np.uint32)
    touch[:total] = touch_enc

    intens = None
    if intensities is not None:
        intens = np.zeros(size, dtype=np.float32)
        intens[:total] = intensities[ray_idx]

    return PreparedBatch(
        size=size,
        n_segments=total,
        arrays={"ints": ints, "floats": floats, "flags": flags, "touch": touch},
        corner_regions=corner_regions,
        region_keys=region_keys,
        intensities=intens,
    )


def fill_corner_slots(prepared: PreparedBatch, table) -> None:
    """Resolve corner region slots via the host table (ops.regiontable)."""
    total = prepared.n_segments
    from ohm_tpu import native

    if native.available():
        slots = native.lookup_slots(prepared.corner_regions, table)
    else:
        slots = table.lookup_np(prepared.corner_regions)  # [total, 8]
    prepared.arrays["ints"][:total, 9:17] = slots


def _prepare_native(map_obj, starts, ends, filter_flags, timestamps, intensities,
                    ray_update_flags, segment_length, min_bucket) -> PreparedBatch:
    """C++ single-pass segmentation/quantisation/packing (ohm_tpu.native)."""
    import ctypes

    from ohm_tpu import native

    n_rays = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.float64)
    ends = np.ascontiguousarray(ends, dtype=np.float64)
    accept = np.ones(n_rays, np.uint8)  # rejects already dropped
    total, n_seg = native.count_segments(starts, ends, accept, segment_length)
    size = _next_bucket(total, min_bucket)

    ints = np.zeros((size, INTS_WIDTH), np.int32)
    ints[:, 9:17] = -1
    floats = np.zeros((size, FLOATS_WIDTH), np.float32)
    flags = np.zeros((size, FLAGS_WIDTH), np.uint8)
    touch = np.zeros(size, np.uint32)
    corner_regions = np.zeros((total, 8, 3), np.int32)
    ray_index = np.zeros(total, np.int32)

    params = native.MapParamsStruct()
    for a in range(3):
        params.origin[a] = float(map_obj.origin[a])
        params.region_spatial[a] = float(map_obj.region_spatial_dims[a])
    params.resolution = float(map_obj.resolution)
    params.region_dim = int(map_obj.region_voxel_dims[0])

    ts = np.ascontiguousarray(timestamps, np.float64) if timestamps is not None else None
    time_base = map_obj.first_ray_time if ts is not None else -1.0
    native.fill_segments(
        starts, ends, accept, np.ascontiguousarray(filter_flags, np.uint32), ts, time_base,
        n_seg, segment_length, bool(ray_update_flags & RayFlag.END_POINT_AS_FREE),
        params, ints, floats, flags, touch, corner_regions, ray_index)

    region_keys = native.unique_regions(corner_regions)

    intens = None
    if intensities is not None:
        intens = np.zeros(size, np.float32)
        intens[:total] = intensities[ray_index]

    return PreparedBatch(
        size=size, n_segments=total,
        arrays={"ints": ints, "floats": floats, "flags": flags.astype(bool), "touch": touch},
        corner_regions=corner_regions, region_keys=region_keys, intensities=intens,
    )


def compact_batch(prepared: PreparedBatch, region_dim: int,
                  with_mean: bool = False, with_tsdf: bool = False) -> dict:
    """Compact wire arrays for host->device transfer (layout in ops.integrate).

    Region-relative 6-bit endpoint offsets + int16 rmin/corner-slots roughly
    halve the per-batch bytes versus the full int32 block; float width is
    trimmed to what the active layer set reads.  Requires region_dim <= 32
    (offsets < 2*dim must fit 6 bits) and arena capacity < 32768 (slots in
    int16); callers fall back to the full arrays otherwise.
    """
    ints = prepared.arrays["ints"]
    rmin = ints[:, 6:9]
    ints16 = np.concatenate([rmin, ints[:, 9:17]], axis=1).astype(np.int16)
    s_off = (ints[:, 0:3] - rmin * region_dim).astype(np.uint32)
    e_off = (ints[:, 3:6] - rmin * region_dim).astype(np.uint32)
    offs = np.zeros((len(ints), 2), np.uint32)
    offs[:, 0] = s_off[:, 0] | (s_off[:, 1] << 6) | (s_off[:, 2] << 12)
    offs[:, 1] = e_off[:, 0] | (e_off[:, 1] << 6) | (e_off[:, 2] << 12)
    width = 12 if with_tsdf else (10 if with_mean else 7)
    return {
        "ints16": ints16,
        "offs": offs,
        "floats": np.ascontiguousarray(prepared.arrays["floats"][:, :width]),
        "flags": prepared.arrays["flags"],
        "touch": prepared.arrays["touch"],
    }


def build_wire(prepared: PreparedBatch, region_dim: int, with_mean: bool,
               with_tsdf: bool, with_touch: bool) -> np.ndarray:
    """Packed single-transfer wire buffer for a prepared batch.

    One C++ pass when the native library is available (native.compact_wire);
    numpy fallback via compact_batch + pack_wire.  Layout contract lives in
    ops.integrate._unpack_batch.
    """
    from ohm_tpu import native

    width = 12 if with_tsdf else (10 if with_mean else 7)
    if native.available():
        return native.compact_wire(
            prepared.arrays["ints"], prepared.arrays["floats"],
            prepared.arrays["flags"].view(np.uint8), prepared.arrays["touch"],
            region_dim, width, with_touch)
    wire = compact_batch(prepared, region_dim, with_mean=with_mean, with_tsdf=with_tsdf)
    wire["floats"] = np.ascontiguousarray(wire["floats"][:, :width])
    return pack_wire(wire, with_touch=with_touch)


def pack_wire(wire: dict, with_touch: bool = True) -> np.ndarray:
    """Pack the compact wire dict into ONE uint8 buffer (single transfer).

    Every host->device array costs a tunnel round trip on the axon runtime;
    one packed buffer collapses 5 transfers into 1.  SoA layout, 4-byte
    aligned blocks: [floats f32 BxW | offs u32 Bx2 | touch u32 B? |
    ints16 i16 Bx11 | flags u8 Bx4] + 2B pad to a 4-byte multiple.
    The device unpack (ops.integrate._unpack_batch) re-derives the layout
    from the static shapes in IntegrateConfig.
    """
    parts = [
        np.ascontiguousarray(wire["floats"]).view(np.uint8).reshape(-1),
        np.ascontiguousarray(wire["offs"]).view(np.uint8).reshape(-1),
    ]
    if with_touch:
        parts.append(np.ascontiguousarray(wire["touch"]).view(np.uint8).reshape(-1))
    parts.append(np.ascontiguousarray(wire["ints16"]).view(np.uint8).reshape(-1))
    parts.append(np.ascontiguousarray(wire["flags"].astype(np.uint8)).view(np.uint8).reshape(-1))
    buf = np.concatenate(parts)
    if buf.size % 4:
        buf = np.concatenate([buf, np.zeros(4 - buf.size % 4, np.uint8)])
    return buf


@dataclasses.dataclass
class PreparedRayflow:
    """Full-ray wire batch: per-RAY records, device-side segmentation.

    The host quantises only the ray endpoints (f64 two-step — the crossing
    counts |end_abs - start_abs| keep exact reference semantics) and
    enumerates crossed regions for allocation plus each ray's candidate
    region table; the per-visit walk, slot resolution (vector equality
    select against the K-candidate table — the full-ray analogue of the
    segmented path's 8 corner slots) and per-segment derivations all happen
    on device (ops.integrate rayflow branch).
    """

    rpad: int                 # padded ray bucket
    n_rays: int               # accepted rays
    bufs: dict                # floats f32[R,7], abs_i32 i32[R,6] (absolute
                              # voxel coords), meta u32[R], touch u32[R],
                              # intens f32[R], ray_table i32[n,32,3],
                              # ray_count i32[n] (rayflow_build output dict)
    region_keys: np.ndarray   # i32 [R,3] unique crossed regions (allocation set)
    bbox: np.ndarray          # i32[6] region bbox (min xyz, max xyz)
    crossings: np.ndarray     # i32[rpad] total wall crossings per ray (0 pad)
    max_axis_steps: int       # max per-axis crossing count over the batch
    table_k: int              # candidate-table width (static bucket)
    params: object            # native.MapParamsStruct (for rayflow_finish)


def prepare_rayflow(map_obj, rays, timestamps=None, intensities=None,
                    ray_update_flags: int = 0, min_bucket: int = 256,
                    min_table_k: int = 4) -> PreparedRayflow | None:
    """Build the full-ray wire; returns None when unavailable (no native lib,
    >65535 rays, >63-region bbox extent, >32 regions on one ray) — the
    caller falls back to the segmented path.

    Single fused C++ pass (native.rayflow_build): region supercover DDA,
    f64 endpoint quantisation, per-ray candidate tables, wire blocks and
    crossing counts all come from one walk per ray — the prep is on the
    one-core host's critical path between batches, so every numpy pass
    removed here is throughput."""
    from ohm_tpu import native
    from ohm_tpu.core.rayflags import RayFlag

    if not native.available():
        return None
    rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
    starts = np.ascontiguousarray(rays[0::2])
    ends = np.ascontiguousarray(rays[1::2])
    n_rays = starts.shape[0]
    if n_rays == 0 or n_rays > 65535:
        return None

    if timestamps is not None:
        timestamps = np.asarray(timestamps, dtype=np.float64).reshape(-1)
        if timestamps.size:
            map_obj.update_first_ray_time(float(timestamps[0]))

    if map_obj.ray_filter is not None:
        starts, ends, filter_flags, accept = map_obj.ray_filter(starts, ends)
        starts = np.ascontiguousarray(starts[accept])
        ends = np.ascontiguousarray(ends[accept])
        filter_flags = filter_flags[accept]
        if timestamps is not None and timestamps.size == n_rays:
            timestamps = timestamps[accept]
        else:
            timestamps = None
        if intensities is not None:
            intensities = np.asarray(intensities, np.float32).reshape(-1)
            intensities = intensities[accept] if intensities.size == n_rays else None
        n_rays = starts.shape[0]
        if n_rays == 0:
            return None
    else:
        filter_flags = np.zeros(n_rays, dtype=np.uint32)

    params = native.MapParamsStruct()
    for a in range(3):
        params.origin[a] = float(map_obj.origin[a])
        params.region_spatial[a] = float(map_obj.region_spatial_dims[a])
    params.resolution = float(map_obj.resolution)
    params.region_dim = int(map_obj.region_voxel_dims[0])

    rpad = _next_bucket(n_rays, min_bucket)
    time_base = map_obj.first_ray_time if timestamps is not None else -1.0
    bufs = native.rayflow_build(
        starts, ends, filter_flags, timestamps, time_base, intensities,
        bool(ray_update_flags & RayFlag.END_POINT_AS_FREE), params, rpad)
    ray_count = bufs["ray_count"]
    if ray_count.size and (int(ray_count.min()) < 0 or bufs["max_ray_k"] > 32):
        return None
    bbox = bufs["bbox"]
    if np.any(bbox[3:6] - bbox[0:3] > 63):
        return None  # packed rel-region uses 6 bits per axis (one-i32 table)
    if int(map_obj.region_voxel_dims[0]) > 32:
        return None  # abs16 coords are 11-bit (63 regions x <=32 voxels)
    table_k = max(4, int(min_table_k))
    while table_k < max(bufs["max_ray_k"], 1):
        table_k += 4
    return PreparedRayflow(rpad=rpad, n_rays=n_rays, bufs=bufs,
                           region_keys=bufs["region_keys"], bbox=bbox,
                           crossings=bufs["crossings"],
                           max_axis_steps=bufs["max_axis"],
                           table_k=table_k, params=params)


def snake_perm(crossings: np.ndarray, group_size: int) -> np.ndarray:
    """Crossings-balanced wire-row permutation ("snake" ordering).

    The expand phase's strided compaction groups put wire row i into group
    i mod R (R = rpad // group_size; ops.integrate.group_rows), and the
    group cap — hence the padded stream length — is the MAX group sum of
    per-ray crossing counts.  Sorting rays by crossings and dealing them
    boustrophedon across the R groups makes the group sums near-equal, so
    the cap sits at the mean instead of the max (~18% less padding on the
    box bench scene).  Returns perm with wire row i sourced from ray
    perm[i]; order-sensitive consumers recover the original order from the
    source index carried in meta bits 16+ (batch_prep.cpp rayflow_finish).
    """
    rpad = len(crossings)
    R = rpad // group_size
    order = np.argsort(-crossings, kind="stable").astype(np.int32)
    ranks = np.arange(rpad, dtype=np.int32)
    p, q = ranks // R, ranks % R
    col = np.where(p % 2 == 0, q, R - 1 - q)
    perm = np.empty(rpad, np.int32)
    perm[p * R + col] = order
    return perm


def frac_dict_of(prepared: PreparedRayflow):
    """Dictionary-encode start_frac when the batch has <= 255 distinct
    triples; returns (dict f32[256,3], idx u8[n_rays]) or None.

    Rays sharing a sensor pose quantise to BIT-IDENTICAL (start voxel,
    start_frac) pairs, so static-scan batches collapse to a handful of
    entries (12 -> 1 B/ray on the wire); trajectory scans with continuously
    moving origins exceed 255 and fall back to the full float block.  The
    dedup itself runs inside the C++ build pass (rayflow_build frac_emit —
    the numpy np.unique formulation cost ~3 ms/8k batch on the one-core
    host, nearly doubling prep)."""
    if prepared.bufs.get("n_frac", 256) > 255:
        return None
    return prepared.bufs["frac_dict"], prepared.bufs["frac_idx"]


def rayflow_wire(prepared: PreparedRayflow, table,
                 with_touch: bool = True, with_intensity: bool = True,
                 cdict: int = 0, fdict=None, perm=None) -> np.ndarray:
    """Assemble the single rayflow transfer buffer (after region allocation):
    [gmeta i32[8] | floats f32[R,7] (or f32[R,4] dir/len under fdict) |
     abs16 u16[R,6] | [touch u32[R]] | [intens f32[R]] |
     [fdict f32[256,3] + fidx u8[R]] | tcand i32[R,K]] — touch/intensity
    blocks ride only when requested (8 B/ray off the occupancy/TSDF wire).
    abs16 words hold 11-bit bbox-relative endpoint voxel coords; their 5
    spare high bits carry the valid/end-as-miss flags and the 16-bit source
    ray index (the former 4 B meta word).  ``fdict`` (frac_dict_of)
    dictionary-encodes start_frac (12 -> 1 B/ray).
    tcand packs a candidate as (slot+1) << 18 | rel-region (6 bits/axis);
    sentinel/unallocated entries have non-positive slot bits and never
    resolve.  ``table`` is the arena's host hash table (slot resolution +
    assembly run in one C++ pass — native.rayflow_finish); requires slot <
    8191 so (slot+1) << 18 stays below the int32 sign bit (the mapper gates
    the arena capacity accordingly)."""
    from ohm_tpu import native

    return native.rayflow_finish(
        prepared.bufs, prepared.n_rays, prepared.rpad, prepared.table_k,
        prepared.params, table, with_touch, with_intensity, cdict=cdict,
        fdict=fdict, perm=perm)
