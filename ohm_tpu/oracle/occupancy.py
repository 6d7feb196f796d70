"""CPU oracle occupancy ray mapper (exact reference semantics, sequential).

Reference parity: ohm/RayMapperOccupancy.cpp:68-339 — per ray: filter, DDA
miss updates on every traversed voxel (with traversal accumulation and the
full kRfExclude*/kRfStopOnFirstOccupied flag matrix), then the sample voxel
hit update (+ voxel mean, touch time, incident normal).  Occupancy adjust
logic: ohm/VoxelOccupancyCompute.h:44-120.

Voxel values are held float32, matching the reference storage; geometry is
float64.  This class is the correctness oracle the TPU mapper is differential
tested against.
"""

from __future__ import annotations

import numpy as np

from ohm_tpu.core import keys as keymath
from ohm_tpu.core import subvoxel
from ohm_tpu.core.layout import (
    OCCUPANCY_LAYER,
    MEAN_LAYER,
    TRAVERSAL_LAYER,
    TOUCH_TIME_LAYER,
    INCIDENT_NORMAL_LAYER,
)
from ohm_tpu.core.probability import unobserved_occupancy_value
from ohm_tpu.core.rayflags import (RayFlag, RayFilterFlag,
                                   normalize_reverse_walk)
from ohm_tpu.oracle import linewalk

_F32_MAX = np.float32(np.finfo(np.float32).max)
_F32_LOWEST = np.float32(np.finfo(np.float32).min)
_UNOBSERVED = np.float32(np.inf)


def occupancy_adjust_hit(initial, hit_adjustment, max_value, saturation_min, saturation_max, null_update):
    """Scalar port of occupancyAdjustHit (ohm/VoxelOccupancyCompute.h:44-54).

    Divergence note: when ``hit_adjustment`` is +inf (the kRfExcludeUnobserved
    keep-state sentinel, ohm/RayMapperOccupancy.cpp:273-275) the reference CPU
    code computes fmin(0 + inf, max_value) = max_value — writing max occupancy
    to a voxel it intended to leave unobserved.  The reference GPU kernel
    (ohmgpu/gpu/RegionUpdate.cl:243) skips the write instead, which matches
    the documented intent; we follow the GPU semantics and preserve +inf.
    """
    initial = np.float32(initial)
    uninitialised = initial == _UNOBSERVED
    base = initial if (null_update or not uninitialised) else np.float32(0)
    if not null_update and (uninitialised or (saturation_min < initial < saturation_max)):
        adj = np.float32(hit_adjustment)
    else:
        adj = np.float32(0)
    if base == _UNOBSERVED:
        return base
    value = base + adj
    return value if np.isinf(value) else min(value, np.float32(max_value))


def occupancy_adjust_miss(initial, miss_adjustment, min_value, saturation_min, saturation_max, null_update):
    """Scalar port of occupancyAdjustMiss (ohm/VoxelOccupancyCompute.h:110-120)."""
    initial = np.float32(initial)
    uninitialised = initial == _UNOBSERVED
    base = initial if (null_update or not uninitialised) else np.float32(0)
    if not null_update and (uninitialised or (saturation_min < initial < saturation_max)):
        adj = np.float32(miss_adjustment)
    else:
        adj = np.float32(0)
    return max(np.float32(min_value), base + adj) if base != _UNOBSERVED else base


class RayMapperOccupancy:
    """Sequential occupancy integrator over interleaved origin/sample rays."""

    def __init__(self, map_obj):
        self.map = map_obj
        self.occupancy_layer = map_obj.layer_index(OCCUPANCY_LAYER)
        self.mean_layer = map_obj.layer_index(MEAN_LAYER)
        self.traversal_layer = map_obj.layer_index(TRAVERSAL_LAYER)
        self.touch_time_layer = map_obj.layer_index(TOUCH_TIME_LAYER)
        self.incident_normal_layer = map_obj.layer_index(INCIDENT_NORMAL_LAYER)
        self.valid = self.occupancy_layer >= 0

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        m = self.map
        rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n_rays = rays.shape[0] // 2
        starts_in = rays[0::2]
        ends_in = rays[1::2]

        flags = normalize_reverse_walk(ray_update_flags)
        sat_min = np.float32(m.saturation_min)
        sat_max = np.float32(m.saturation_max)
        voxel_min = np.float32(m.min_voxel_value)
        voxel_max = np.float32(m.max_voxel_value)
        hit_value = np.float32(m.hit_value)
        miss_value = np.float32(m.miss_value)
        threshold = np.float32(m.occupancy_threshold_value)
        dims = m.region_voxel_dims

        touch_stamp = m.touch()
        if timestamps is not None:
            m.update_first_ray_time(float(np.asarray(timestamps).flat[0]))
        time_base = m.first_ray_time

        if m.ray_filter is not None:
            starts, ends, filter_flags, accept = m.ray_filter(starts_in, ends_in)
        else:
            starts, ends = starts_in, ends_in
            filter_flags = np.zeros(n_rays, dtype=np.uint32)
            accept = np.ones(n_rays, dtype=bool)

        occupancy_layer = self.occupancy_layer
        mean_layer = self.mean_layer
        traversal_layer = self.traversal_layer
        touch_time_layer = self.touch_time_layer
        incident_layer = self.incident_normal_layer

        # Walk state shared between the visit closure and the per-ray loop,
        # mirroring the captured locals in the reference implementation.
        state = {"stop_adjustments": False, "last_exit_range": 0.0}

        def touch_voxel_miss(abs_key, enter_range, exit_range):
            region, local = keymath.abs_to_key(abs_key, dims)
            chunk = m.region(region, allow_create=True)
            idx = int(keymath.voxel_index(local, dims))
            occ = chunk.layers[occupancy_layer][OCCUPANCY_LAYER]
            initial = occ[idx]

            unobserved = initial == _UNOBSERVED
            free = (not unobserved) and initial < threshold
            occupied = (not unobserved) and initial >= threshold

            miss_adj = miss_value
            if unobserved and (flags & RayFlag.EXCLUDE_UNOBSERVED):
                miss_adj = _UNOBSERVED
            if free and (flags & RayFlag.EXCLUDE_FREE):
                miss_adj = np.float32(0)
            if occupied and (flags & RayFlag.EXCLUDE_OCCUPIED):
                miss_adj = np.float32(0)

            occ[idx] = occupancy_adjust_miss(initial, miss_adj, voxel_min, sat_min, sat_max,
                                             state["stop_adjustments"])

            if traversal_layer >= 0:
                trav = chunk.layers[traversal_layer]["traversal"]
                trav[idx] = trav[idx] + np.float32(exit_range - enter_range)

            if (flags & RayFlag.STOP_ON_FIRST_OCCUPIED) and occupied:
                state["stop_adjustments"] = True
            chunk.dirty_stamp = touch_stamp
            chunk.touched_stamps[occupancy_layer] = touch_stamp
            state["last_exit_range"] = exit_range
            return True

        def visit(abs_key, _marker, enter_range, exit_range):
            return touch_voxel_miss(abs_key, enter_range, exit_range)

        for i in range(n_rays):
            if not accept[i]:
                continue
            start = starts[i]
            end = ends[i]
            fflags = int(filter_flags[i])

            include_sample_in_ray = bool(fflags & RayFilterFlag.CLIPPED_END) or bool(flags & RayFlag.END_POINT_AS_FREE)
            walk_flags = 0 if include_sample_in_ray else linewalk.EXCLUDE_END_VOXEL
            if flags & RayFlag.EXCLUDE_ORIGIN:
                walk_flags |= linewalk.EXCLUDE_START_VOXEL

            if not (flags & RayFlag.EXCLUDE_RAY):
                state["stop_adjustments"] = False
                linewalk.walk_segment_keys(m, start, end, visit, walk_flags)

            if not state["stop_adjustments"] and not include_sample_in_ray and not (flags & RayFlag.EXCLUDE_SAMPLE):
                region, local = m.voxel_key(end)
                chunk = m.region(region, allow_create=True)
                idx = int(keymath.voxel_index(local, dims))
                occ = chunk.layers[occupancy_layer][OCCUPANCY_LAYER]
                initial = occ[idx]

                unobserved = initial == _UNOBSERVED
                free = (not unobserved) and initial < threshold
                occupied = (not unobserved) and initial >= threshold

                hit_adj = hit_value
                if unobserved and (flags & RayFlag.EXCLUDE_UNOBSERVED):
                    hit_adj = _UNOBSERVED
                if free and (flags & RayFlag.EXCLUDE_FREE):
                    hit_adj = np.float32(0)
                if occupied and (flags & RayFlag.EXCLUDE_OCCUPIED):
                    hit_adj = np.float32(0)

                new_value = occupancy_adjust_hit(initial, hit_adj, voxel_max, sat_min, sat_max, False)

                sample_count = 0
                if mean_layer >= 0:
                    mean = chunk.layers[mean_layer]
                    local_coord = end - m.voxel_centre_global(region, local)
                    mean["coord"][idx] = subvoxel.sub_voxel_update(
                        mean["coord"][idx], mean["count"][idx], local_coord.astype(np.float32), m.resolution
                    )
                    sample_count = int(mean["count"][idx])
                    mean["count"][idx] += 1
                    chunk.touched_stamps[mean_layer] = touch_stamp
                occ[idx] = new_value

                if traversal_layer >= 0:
                    trav = chunk.layers[traversal_layer]["traversal"]
                    trav[idx] = trav[idx] + np.float32(np.linalg.norm(end - start) - state["last_exit_range"])

                if touch_time_layer >= 0 and timestamps is not None:
                    chunk.layers[touch_time_layer]["touch"][idx] = subvoxel.encode_touch_time(
                        time_base, float(np.asarray(timestamps).flat[i])
                    )

                if incident_layer >= 0:
                    packed = chunk.layers[incident_layer]["packed_normal"][idx]
                    chunk.layers[incident_layer]["packed_normal"][idx] = subvoxel.update_incident_normal(
                        packed, (start - end).astype(np.float32), sample_count
                    )

                chunk.dirty_stamp = touch_stamp
                chunk.touched_stamps[occupancy_layer] = touch_stamp

        return n_rays
