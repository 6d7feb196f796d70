"""Vectorised device DDA: expand a ray batch into per-voxel visit records.

TPU-native replacement for the per-thread DDA in ohmgpu/gpu/LineWalk.cl /
ohm/LineWalkCompute.h:345-413.  Instead of stepping voxels sequentially, the
walk is computed in closed form: along each axis the wall-crossing times are
an arithmetic sequence (initial_exit + k * step_delta), so the visit order
is the three sequences MERGED BY TIME — one vectorised per-ray sort, no
sequential scan, no data-dependent loop.  (A lax.scan formulation works but
costs two orders of magnitude more compile time and similar run time.)

Given sorted events, interval i (between events i-1 and i) is a visited
voxel whose coordinate is start + step_dir * (per-axis event counts before
i); the final interval is the end voxel, which the caller handles separately
(hit or as-miss record, reference: RayMapperOccupancy.cpp:222-233), so it
falls out of the valid set naturally.

Geometry model (precision trick mirrors GpuMap.cpp:666-676): the host
quantises endpoints to absolute voxel coordinates in float64 and passes only
*voxel-local* float32 fractions, so single precision on device is accurate
regardless of distance from the map origin.

Tie-break parity: simultaneous crossings sort by DESCENDING axis, matching
walkSelectNextAxis (ohm/LineWalkCompute.h:282-289) where ties pick the
highest axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# "Infinite" time sentinel.  Deliberately a large finite value, not inf:
# the TPU toolchain pathologically slow-compiles kernels whose constant
# pool contains f32 +-inf broadcasts.  Any value far above the longest
# representable ray works identically for the time ordering.
_BIG = jnp.float32(3.0e38)


def _init_walk(start_frac, direction, length, start_abs, end_abs, resolution):
    """Port of walkInitRay/walkCalculateSteps (ohm/LineWalkCompute.h:188-280).

    All times are distances along the ray from the start point, in f32.
    ``start_frac`` plays the role of (start - start_voxel_centre).
    """
    res = jnp.float32(resolution)
    half = jnp.float32(0.5) * res
    sign = (direction < 0)  # bool [B,3]

    # Safe inverse: a zero direction component gets a huge finite inverse
    # (the reference gets IEEE +-inf; any axis with zero direction also has
    # zero key steps, so its events are masked out entirely).
    inv = jnp.where(direction != 0, 1.0 / jnp.where(direction != 0, direction, 1.0),
                    jnp.where(sign, -_BIG, _BIG))
    inv = jnp.where(length[:, None] > 0, inv, 0.0)

    # Exit time of the start voxel per axis: distance to the wall in the
    # travel direction.  Wall offset from start = (+-half - start_frac).
    wall = jnp.where(sign, -half, half)
    initial_exit = (wall - start_frac) * inv
    step_delta = jnp.abs(res * inv)
    crossings = jnp.abs(end_abs - start_abs)  # int32 [B,3] events per axis
    return sign, initial_exit, step_delta, crossings


def walk_total_cap(max_steps: int) -> int:
    """Width of the walk's truncated record axis (see walk_rays): a segment
    of <= max_steps per-axis crossings crosses at most ~sqrt(3)*steps walls
    in total."""
    return min(3 * max_steps, int(np.ceil(np.sqrt(3.0) * (max_steps - 3))) + 4)


def walk_rays_unordered(start_abs, end_abs, start_frac, direction, length,
                        resolution, max_steps: int):
    """Rank-based walk: visit records WITHOUT the per-ray event sort.

    For arithmetic event sequences the global position of event (axis a,
    index k) is closed-form: k plus, for each other axis b, the number of
    b-events preceding it — computable by inverting b's arithmetic sequence
    (estimate + bounded forward correction), no sort.  The total order used
    for ranking is EXACTLY the sorted walk's key order (masked-low-2-bit f32
    time bits + descending-axis tie priority), so the emitted voxel set and
    enter/exit ranges are bit-identical to walk_rays — only the RECORD ORDER
    differs ([B, 3, S] axis-major instead of time-sorted), which downstream
    sort-reduce pipelines never relied on.  Replaces the expand phase's
    widest row sort (~384-wide over 3.1M elements at 8k rays).

    Returns the walk dict of walk_rays plus 'first' (the ray's origin-voxel
    record, for kRfExcludeOrigin) with a [B, 3*S] record axis.
    """
    B = start_abs.shape[0]
    S = max_steps
    sign, initial_exit, step_delta, crossings = _init_walk(
        start_frac, direction, length, start_abs, end_abs, resolution
    )
    step_dir = jnp.where(sign, -1, 1).astype(jnp.int32)  # [B,3]
    n_ax = jnp.minimum(crossings, S)  # [B,3] valid events per axis

    k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
    times = initial_exit[:, :, None] + step_delta[:, :, None] * k.astype(jnp.float32)
    valid = k < n_ax[:, :, None]  # [B,3,S]
    # Masked-int key times: the exact comparison domain of the sorted walk
    # (ops above: key = (bitcast(t) & ~3) | axis_tiebreak).
    mt = jax.lax.bitcast_convert_type(times, jnp.int32) & ~3

    inv_d = jnp.where(step_delta > 0, 1.0 / jnp.where(step_delta > 0, step_delta, 1.0), 0.0)

    def rank_against(b_axis, a_axis):
        """#events of axis b preceding each event of axis a ([B, S])."""
        t_a = times[:, a_axis, :]                      # [B,S]
        mt_a = mt[:, a_axis, :]
        e0_b = initial_exit[:, b_axis][:, None]
        d_b = step_delta[:, b_axis][:, None]
        n_b = n_ax[:, b_axis][:, None]
        est = jnp.floor((t_a - e0_b) * inv_d[:, b_axis][:, None]).astype(jnp.int32)
        c = jnp.clip(est - 3, 0, n_b)
        # Correction over the 8-wide error window (f32 inversion is within
        # ~1 of exact; +-3 margin is generous): binary advance instead of 7
        # forward steps.  p(m) = (m < n_b) & (mt(m) < mt_a) is monotone
        # non-increasing in m — event times are non-negative and
        # non-decreasing, so their masked-int images order like the floats —
        # hence advancing by `step` exactly when p(c + step - 1) holds lands
        # on the same count as stepping forward one at a time.
        for step in (4, 2, 1):
            m = c + (step - 1)
            t_m = e0_b + m.astype(jnp.float32) * d_b
            mt_m = jax.lax.bitcast_convert_type(t_m, jnp.int32) & ~3
            adv = (m < n_b) & (mt_m < mt_a)
            c = c + jnp.where(adv, step, 0)
        if b_axis > a_axis:  # higher axis wins ties (walkSelectNextAxis)
            t_c = e0_b + c.astype(jnp.float32) * d_b
            mt_c = jax.lax.bitcast_convert_type(t_c, jnp.int32) & ~3
            c = c + ((c < n_b) & (mt_c == mt_a)).astype(jnp.int32)
        return c

    voxels = []
    enters = []
    zero = jnp.zeros((B, S), jnp.float32)
    for a in range(3):
        counts = [None, None, None]
        counts[a] = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, S), 1), (B, S))
        prevs = []  # last event time per axis before this event
        ka = counts[a]
        prevs.append(jnp.where(ka > 0,
                               initial_exit[:, a][:, None]
                               + (ka - 1).astype(jnp.float32) * step_delta[:, a][:, None],
                               zero))
        for b in range(3):
            if b == a:
                continue
            r = rank_against(b, a)
            counts[b] = r
            prevs.append(jnp.where(r > 0,
                                   initial_exit[:, b][:, None]
                                   + (r - 1).astype(jnp.float32) * step_delta[:, b][:, None],
                                   zero))
        vox = start_abs[:, None, :] + step_dir[:, None, :] * jnp.stack(counts, axis=-1)
        voxels.append(vox)
        enters.append(jnp.maximum(jnp.maximum(prevs[0], prevs[1]), prevs[2]))

    voxels = jnp.concatenate(voxels, axis=1).reshape(B, 3 * S, 3)
    enters = jnp.concatenate(enters, axis=1)
    exits = times.reshape(B, 3 * S)
    valid_flat = valid.reshape(B, 3 * S)
    # Origin-voxel record: global rank 0 (its per-axis counts are all zero,
    # i.e. it is its axis's k==0 event with no earlier events elsewhere).
    first = valid_flat & jnp.all(voxels == start_abs[:, None, :], axis=-1)

    end_enter = jnp.max(jnp.where(valid_flat, exits, 0.0), axis=1)
    overflow = jnp.any(crossings > S, axis=1)
    return {
        "voxels": voxels,
        "enters": jnp.where(valid_flat, enters, 0.0),
        "exits": exits,
        "valid": valid_flat,
        "first": first,
        "end_enter": end_enter,
        "overflow": overflow,
        "truncated": jnp.int32(0),
    }


def walk_rays(start_abs, end_abs, start_frac, direction, length, resolution, max_steps: int,
              total_cap: int | None = None):
    """Expand rays to visit records via time-sorted wall-crossing events.

    ``max_steps`` caps the PER-AXIS crossing count (host segmentation
    guarantees it; see mapping.batch.max_steps_for).  The flattened record
    axis has size 3 * max_steps.

    Returns dict with:
      voxels   int32[B, 3S, 3]  visited voxel abs coords (excludes end voxel)
      enters   f32[B, 3S]       enter range per visit
      exits    f32[B, 3S]       exit range per visit
      valid    bool[B, 3S]      record validity
      end_enter f32[B]          enter range of the end voxel
      overflow bool[B]          a per-axis crossing count exceeded max_steps
    """
    B = start_abs.shape[0]
    S = max_steps
    sign, initial_exit, step_delta, crossings = _init_walk(
        start_frac, direction, length, start_abs, end_abs, resolution
    )
    step_dir = jnp.where(sign, -1, 1).astype(jnp.int32)  # [B,3]

    # Event times per axis: t[a, k] = initial_exit[a] + k * step_delta[a],
    # masked BIG beyond that axis's crossing count.  The axis planes are laid
    # out z, y, x: lax.sort is STABLE, so equal times keep plane order, which
    # realises the reference's DESCENDING-axis tie-break (walkSelectNextAxis,
    # ohm/LineWalkCompute.h:282-289) without a second sort key — one fewer
    # operand in the widest sort of the expand phase.
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
    times = initial_exit[:, :, None] + step_delta[:, :, None] * k.astype(jnp.float32)
    mask = k < jnp.minimum(crossings, S)[:, :, None]
    times = jnp.where(mask, times, _BIG)

    # Single-operand event sort: event times are non-negative f32, whose
    # int32 bit patterns sort in the same order, so the axis id rides in the
    # low 2 bits of the time key ((2 - axis): z -> 0 sorts first on masked
    # ties, realising the descending-axis tie-break).  Recovered times are
    # biased down by <= 3 ulp — far inside every downstream tolerance.
    flat_times = times[:, ::-1, :].reshape(B, 3 * S)  # planes z, y, x
    axis_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 3, 1), 1)
    flat_axis = jnp.broadcast_to(axis_ids, times.shape).reshape(B, 3 * S)  # 0=z,1=y,2=x
    tb = jax.lax.bitcast_convert_type(flat_times, jnp.int32)
    key = (tb & ~3) | flat_axis
    key_sorted = jax.lax.sort((key,), num_keys=1, dimension=1)[0]
    t_sorted = jax.lax.bitcast_convert_type(key_sorted & ~3, jnp.float32)
    a_sorted = 2 - (key_sorted & 3)

    # Valid events sort to the front, so the sorted stream can be truncated
    # below 3*S — shrinking every downstream record-level op (notably the
    # global arena sort).  The default sqrt(3)*S bound is only valid when S
    # is a LENGTH bound (the segmented path: steps = segment_length/res); a
    # full ray's total crossings reach 3*max_axis for diagonal rays, so
    # rayflow callers pass an explicit cap from the exact per-batch max
    # (IntegrateConfig.walk_cap).  `truncated` counts real events dropped by
    # an insufficient cap (asserted zero in validate mode).
    if total_cap is None:
        total_cap = walk_total_cap(S)
    total_cap = min(total_cap, 3 * S)
    n_real = jnp.minimum(crossings, S).sum(axis=1)  # valid events per ray
    truncated = jnp.sum(jnp.maximum(n_real - total_cap, 0))
    t_sorted = t_sorted[:, :total_cap]
    a_sorted = a_sorted[:, :total_cap]
    key_sorted = key_sorted[:, :total_cap]

    # Per-axis exclusive counts -> voxel coordinate of each interval.
    onehot = (a_sorted[:, :, None] == jnp.arange(3)[None, None, :]).astype(jnp.int32)
    counts_incl = jnp.cumsum(onehot, axis=1)
    counts_excl = counts_incl - onehot
    voxels = start_abs[:, None, :] + step_dir[:, None, :] * counts_excl

    exits = t_sorted
    enters = jnp.concatenate([jnp.zeros((B, 1), jnp.float32), t_sorted[:, :-1]], axis=1)
    # Sentinel detection in the int key domain: the recovered sentinel time
    # is _BIG with its low mantissa bits masked, so a float compare against
    # _BIG would wrongly pass it.
    big_key = jax.lax.bitcast_convert_type(_BIG, jnp.int32) & ~3
    valid = key_sorted < big_key

    n_events = valid.sum(axis=1)
    end_enter = jnp.max(jnp.where(valid, t_sorted, 0.0), axis=1)
    overflow = jnp.any(crossings > S, axis=1)

    # Degenerate rays (start == end voxel): no events, no records; the end
    # voxel is the caller's end record with end_enter = 0.  (Matches the
    # reference where the walk loop body never runs.)
    del n_events
    return {
        "voxels": voxels,
        "enters": enters,
        "exits": exits,
        "valid": valid,
        "end_enter": end_enter,
        "overflow": overflow,
        "truncated": truncated,
    }
