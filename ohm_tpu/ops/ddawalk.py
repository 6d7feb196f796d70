"""Vectorised device DDA: expand a ray batch into per-voxel visit records.

TPU-native replacement for the per-thread DDA in ohmgpu/gpu/LineWalk.cl /
ohm/LineWalkCompute.h:345-413.  Instead of one GPU thread walking one ray
with data-dependent loop length, the whole batch advances in lock-step
through a ``lax.scan`` with a static step cap; finished rays are masked.

Geometry model (precision trick mirrors GpuMap.cpp:666-676): the host
quantises endpoints to absolute voxel coordinates in float64 and passes
only *voxel-local* float32 fractions, so single precision on device is
accurate regardless of distance from the map origin.

Inputs per ray (see mapping.batch.RayBatch):
  start_abs, end_abs : int32[B,3]  absolute voxel coords of endpoints
  start_frac         : f32[B,3]    start point relative to start voxel centre
  direction          : f32[B,3]    unit direction
  length             : f32[B]      segment length

Outputs: [B, S] visit records (absolute voxel coord, enter/exit range,
valid mask) for every voxel strictly before the end voxel, plus the enter
range of the end voxel.  The end voxel itself is handled by the caller
(hit record or miss record, reference: RayMapperOccupancy.cpp:222-233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# "Infinite" time sentinel.  Deliberately a large finite value, not inf:
# XLA:CPU's LLVM backend pathologically slow-compiles kernels whose constant
# pool contains f32 +-inf broadcasts (hundreds of seconds for a single
# `where(pred, inf, x)`).  Any value far above the longest representable ray
# works identically for the min/argmin axis selection.
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
    # zero key steps, so its time is forced to _BIG below either way).
    # Degenerate rays (length == 0) get inverse 0 (ohm/LineWalkCompute.h:204-210).
    inv = jnp.where(direction != 0, 1.0 / jnp.where(direction != 0, direction, 1.0),
                    jnp.where(sign, -_BIG, _BIG))
    inv = jnp.where(length[:, None] > 0, inv, 0.0)

    # Exit time of the start voxel per axis: distance to the wall in the
    # travel direction.  Wall offset from start = (+-half - start_frac).
    wall = jnp.where(sign, -half, half)
    initial_exit = (wall - start_frac) * inv

    # Per-axis time step between walls: res / |direction| (inf when axis
    # direction is zero).
    step_delta = jnp.abs(res * inv)

    steps_remaining = end_abs - start_abs  # int32 [B,3]

    time_next = jnp.where(steps_remaining != 0, initial_exit, _BIG)
    return sign, initial_exit, step_delta, steps_remaining, time_next


def walk_rays(start_abs, end_abs, start_frac, direction, length, resolution, max_steps: int):
    """Expand rays to visit records.

    Returns dict with:
      voxels   int32[B, S, 3]  visited voxel abs coords (excludes end voxel)
      enters   f32[B, S]       enter range per visit
      exits    f32[B, S]       exit range per visit
      valid    bool[B, S]      record validity
      end_enter f32[B]         enter range of the end voxel
      overflow bool[B]         ray did not reach its end voxel within S steps
    """
    B = start_abs.shape[0]
    sign, initial_exit, step_delta, steps_remaining, time_next = _init_walk(
        start_frac, direction, length, start_abs, end_abs, resolution
    )
    step_dir = jnp.where(sign, -1, 1).astype(jnp.int32)  # [B,3]

    at_end0 = jnp.all(start_abs == end_abs, axis=-1)

    def body(carry, _):
        current, time_next, steps_remaining, stepped, last_time, done = carry

        # Emit the current voxel for rays still walking.
        emit_valid = ~done
        axis_time = jnp.min(time_next, axis=-1)  # exit time of current voxel
        record = (current, last_time, axis_time, emit_valid)

        # Step to the next voxel along the axis with the earliest exit.
        # Tie-break on the HIGHEST axis index, matching the reference's
        # walkSelectNextAxis chain (ohm/LineWalkCompute.h:282-289) — exact
        # ties are common because rays often start on voxel corners.
        axis = 2 - jnp.argmin(time_next[..., ::-1], axis=-1)  # [B]
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)  # [B,3]
        new_current = current + onehot * step_dir
        new_stepped = stepped + onehot
        new_remaining = steps_remaining - onehot * step_dir
        # Recompute (not accumulate) the axis time as in walkStepNext
        # (ohm/LineWalkCompute.h:291-307) for exact parity.
        new_time = initial_exit + step_delta * new_stepped.astype(jnp.float32)
        new_time = jnp.where(new_remaining != 0, new_time, _BIG)
        time_next = jnp.where(onehot > 0, new_time, time_next)

        new_done = done | jnp.all(new_current == end_abs, axis=-1) | jnp.all(new_remaining == 0, axis=-1)
        new_last = jnp.where(done, last_time, axis_time)
        carry = (new_current, time_next, new_remaining, new_stepped, new_last, new_done)
        return carry, record

    init = (
        start_abs,
        time_next,
        steps_remaining,
        jnp.zeros_like(start_abs),
        jnp.zeros((B,), jnp.float32),
        at_end0,
    )
    carry, (voxels, enters, exits, valid) = jax.lax.scan(body, init, None, length=max_steps)
    _, _, steps_remaining_f, _, end_enter, done_f = carry

    # scan stacks along axis 0 -> [S, B, ...]; move batch first.
    voxels = jnp.moveaxis(voxels, 0, 1)
    enters = jnp.moveaxis(enters, 0, 1)
    exits = jnp.moveaxis(exits, 0, 1)
    valid = jnp.moveaxis(valid, 0, 1)

    overflow = ~done_f
    return {
        "voxels": voxels,
        "enters": enters,
        "exits": exits,
        "valid": valid,
        "end_enter": end_enter,
        "overflow": overflow,
    }
