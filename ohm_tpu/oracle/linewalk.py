"""CPU oracle DDA: voxel traversal between two points.

Exact behavioural port of the shared CPU/GPU walk contract in
ohm/LineWalkCompute.h:151-413 (walkInitRay, walkCalculateSteps,
walkSelectNextAxis, walkStepNext, walkLineVoxels) in float64, operating on
*absolute voxel coordinates* (region * dims + local).  The reference's
per-voxel visit callback receives (key, marker, enter_range, exit_range); we
preserve that contract so the occupancy/NDT/TSDF oracles replicate reference
update ordering exactly.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np

# Walk flags (reference: ohm/LineWalkCompute.h:56-63).
EXCLUDE_START_VOXEL = 1 << 0
EXCLUDE_END_VOXEL = 1 << 1

# Voxel markers (reference: ohm/LineWalkCompute.h:139-148).
MARKER_SEGMENT = 0
MARKER_START = 1
MARKER_END = 2

#: Default epsilon for detecting degenerate (zero length) rays
#: (reference: ohm/LineWalk.h walkSegmentKeys default argument 1e-6).
DEFAULT_LENGTH_EPSILON = 1e-6


def _init_steps(start, end, start_voxel_centre, resolution, length_epsilon):
    """Port of walkInitRay + walkCalculateSteps (ohm/LineWalkCompute.h:188-280)."""
    direction = [end[i] - start[i] for i in range(3)]
    length_sqr = direction[0] ** 2 + direction[1] ** 2 + direction[2] ** 2
    length = math.sqrt(length_sqr) if length_sqr > length_epsilon else 0.0

    sign = [1 if direction[i] < 0 else 0 for i in range(3)]

    # 1/direction follows IEEE semantics as in the reference: a zero component
    # yields +/-inf, which makes the exit time on that axis infinite.  For
    # degenerate rays (length == 0) the inverse is forced to zero
    # (ohm/LineWalkCompute.h:204-210).
    if length > 0:
        direction = [d / length for d in direction]
        inv = [1.0 / d if d != 0.0 else math.copysign(math.inf, d) for d in direction]
    else:
        inv = [0.0, 0.0, 0.0]

    def wall_exit(voxel_min, voxel_max):
        # walkCalculateVoxelWallExit: picks the exit wall per axis by sign.
        out = []
        for i in range(3):
            bound = voxel_min[i] if sign[i] else voxel_max[i]
            out.append((bound - start[i]) * inv[i])
        return out

    half = 0.5 * resolution
    vmin = [start_voxel_centre[i] - half for i in range(3)]
    vmax = [start_voxel_centre[i] + half for i in range(3)]
    initial_exit = wall_exit(vmin, vmax)

    step_dir = [-2 * s + 1 for s in sign]
    shift = [step_dir[i] * resolution for i in range(3)]
    vmin2 = [vmin[i] + shift[i] for i in range(3)]
    vmax2 = [vmax[i] + shift[i] for i in range(3)]
    next_exit = wall_exit(vmin2, vmax2)

    step_delta = [next_exit[i] - initial_exit[i] if not math.isinf(next_exit[i]) else next_exit[i]
                  for i in range(3)]
    return initial_exit, step_delta, sign, length


def walk_line_voxels(
    start,
    end,
    start_abs,
    end_abs,
    start_voxel_centre,
    resolution: float,
    visit: Callable[[np.ndarray, int, float, float], bool],
    flags: int = 0,
    length_epsilon: float = DEFAULT_LENGTH_EPSILON,
) -> int:
    """Walk voxels from start to end, invoking visit(abs_key, marker, enter, exit).

    Exact port of walkLineVoxels (ohm/LineWalkCompute.h:345-413).  ``start_abs``
    and ``end_abs`` are int absolute voxel coordinates for the endpoint voxels
    (pre-computed by the caller with the map's quantisation so the walk and
    the key model agree).  Returns the number of voxels traversed.
    """
    start = [float(v) for v in np.asarray(start, dtype=np.float64)]
    end = [float(v) for v in np.asarray(end, dtype=np.float64)]
    centre = [float(v) for v in np.asarray(start_voxel_centre, dtype=np.float64)]

    initial_delta, step_delta, sign, length = _init_steps(start, end, centre, resolution, length_epsilon)

    current = [int(v) for v in np.asarray(start_abs).reshape(3)]
    end_key = [int(v) for v in np.asarray(end_abs).reshape(3)]

    steps_remaining = [end_key[i] - current[i] for i in range(3)]
    stepped = [0, 0, 0]

    limit_flags = 0
    for i in range(3):
        if steps_remaining[i] == 0:
            limit_flags |= 1 << i

    time_next = [initial_delta[i] if steps_remaining[i] else math.inf for i in range(3)]

    def select_axis():
        axis = 0
        axis = axis if time_next[axis] < time_next[1] else 1
        axis = axis if time_next[axis] < time_next[2] else 2
        return axis

    def step_next(axis):
        # Port of walkStepNext (ohm/LineWalkCompute.h:291-307).
        nonlocal limit_flags
        step_dir = -2 * sign[axis] + 1
        current[axis] += step_dir
        steps_remaining[axis] -= step_dir
        stepped[axis] += step_dir
        time_next[axis] = (initial_delta[axis] + step_delta[axis] * abs(stepped[axis])
                           if steps_remaining[axis] else math.inf)
        if steps_remaining[axis] == 0:
            limit_flags |= 1 << axis
        return select_axis()

    axis = select_axis()
    last_time = 0.0
    voxel_count = 0
    marker = MARKER_START
    continue_traversal = True

    if flags & EXCLUDE_START_VOXEL:
        marker = MARKER_SEGMENT
        last_time = time_next[axis]
        voxel_count += 1
        axis = step_next(axis)

    while continue_traversal and limit_flags < 7 and current != end_key:
        continue_traversal = visit(np.array(current, dtype=np.int32), marker, last_time, time_next[axis])
        marker = MARKER_SEGMENT
        last_time = time_next[axis]
        voxel_count += 1
        axis = step_next(axis)

    if continue_traversal and not (flags & EXCLUDE_END_VOXEL):
        visit(np.array(end_key, dtype=np.int32), MARKER_END, last_time, length)
        voxel_count += 1

    return voxel_count


def walk_segment_keys(map_obj, start_point, end_point, visit, flags: int = 0) -> int:
    """Walk using a map's quantisation (port of ohm/LineWalk.h walkSegmentKeys).

    ``visit`` receives (abs_key int32[3], marker, enter_range, exit_range).
    """
    start_point = np.asarray(start_point, dtype=np.float64)
    end_point = np.asarray(end_point, dtype=np.float64)
    sr, sl = map_obj.voxel_key(start_point)
    er, el = map_obj.voxel_key(end_point)
    from ohm_tpu.core.keys import key_to_abs

    start_abs = key_to_abs(sr, sl, map_obj.region_voxel_dims)
    end_abs = key_to_abs(er, el, map_obj.region_voxel_dims)
    centre = map_obj.voxel_centre_global(sr, sl)
    return walk_line_voxels(start_point, end_point, start_abs, end_abs, centre,
                            map_obj.resolution, visit, flags)
