"""CPU oracle TSDF ray mapper.

Exact port of ohm/VoxelTsdfCompute.h (voxblox-style projective TSDF with
weight dropoff / sparsity compensation) and ohm/RayMapperTsdf.cpp.  Note the
reference quirks preserved here: the walk *includes* the sample voxel (no end
exclusion), ray_update_flags are ignored, and the SDF uses the unfiltered
sensor/sample points even when the ray filter clips the walked segment.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ohm_tpu.core import keys as keymath
from ohm_tpu.core.layout import TSDF_LAYER
from ohm_tpu.oracle import linewalk


@dataclasses.dataclass
class TsdfOptions:
    """Reference: ohm/VoxelTsdf.h:27-37."""

    max_weight: float = 1e4
    default_truncation_distance: float = 0.1
    dropoff_epsilon: float = 0.0
    sparsity_compensation_factor: float = 1.0
    #: Apply truncation at every visit in reference ray order (exact
    #: ohm/VoxelTsdfCompute.h semantics); False = once per batch (the
    #: faster approximation, bounded by the truncation distance).  Device
    #: mappers plumb this into ops.integrate_tsdf.TsdfConfig.
    per_visit: bool = True


def calculate_tsdf(sensor, sample, voxel_centre, options: TsdfOptions, weight, distance):
    """Scalar port of calculateTsdf (ohm/VoxelTsdfCompute.h:20-66 onwards)."""
    sensor = np.asarray(sensor, dtype=np.float64)
    sample = np.asarray(sample, dtype=np.float64)
    voxel_centre = np.asarray(voxel_centre, dtype=np.float64)
    sensor_to_voxel = voxel_centre - sensor
    sensor_to_sample = sample - sensor
    distance_g = float(np.sqrt(np.dot(sensor_to_sample, sensor_to_sample)))
    distance_g_v = float(np.dot(sensor_to_voxel, sensor_to_sample)) / distance_g
    sdf = np.float32(distance_g - distance_g_v)

    trunc = np.float32(options.default_truncation_distance)
    initial_weight = np.float32(weight)
    updated_weight = np.float32(1.0)
    if options.dropoff_epsilon > 0:
        updated_weight = updated_weight * (trunc + sdf) / (trunc - np.float32(options.dropoff_epsilon))
    updated_weight = max(updated_weight, np.float32(0))
    if options.sparsity_compensation_factor > 0 and abs(sdf) < trunc:
        updated_weight = updated_weight * np.float32(options.sparsity_compensation_factor)

    new_weight = initial_weight + updated_weight
    if abs(new_weight) < np.float32(1e-5):
        return weight, distance
    new_sdf = (sdf * updated_weight + np.float32(distance) * initial_weight) / new_weight
    new_sdf = min(trunc, new_sdf) if new_sdf > 0 else max(-trunc, new_sdf)
    return min(new_weight, np.float32(options.max_weight)), new_sdf


class RayMapperTsdf:
    """Sequential TSDF integrator (reference: ohm/RayMapperTsdf.cpp)."""

    def __init__(self, map_obj, options: TsdfOptions | None = None):
        self.map = map_obj
        self.options = options or TsdfOptions()
        map_obj.layout.add_tsdf()
        map_obj.ensure_chunk_layers()
        self.tsdf_layer = map_obj.layer_index(TSDF_LAYER)

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        from ohm_tpu.core.rayflags import normalize_reverse_walk

        normalize_reverse_walk(ray_update_flags)  # reject REVERSE|STOP loudly
        m = self.map
        rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n_rays = rays.shape[0] // 2
        dims = m.region_voxel_dims
        m.touch()
        if timestamps is not None:
            m.update_first_ray_time(float(np.asarray(timestamps).flat[0]))

        for i in range(n_rays):
            sensor = rays[2 * i]
            sample = rays[2 * i + 1]
            ray_start, ray_end = sensor.copy(), sample.copy()
            if m.ray_filter is not None:
                s, e, flags, accept = m.ray_filter(ray_start[None], ray_end[None])
                if not accept[0]:
                    continue
                ray_start, ray_end = s[0], e[0]

            def visit(abs_key, _marker, _enter, _exit):
                region, local = keymath.abs_to_key(abs_key, dims)
                chunk = m.region(region, allow_create=True)
                idx = int(keymath.voxel_index(local, dims))
                arr = chunk.layers[self.tsdf_layer]
                centre = m.voxel_centre_global(region, local)
                w, d = calculate_tsdf(sensor, sample, centre, self.options,
                                      arr["weight"][idx], arr["distance"][idx])
                arr["weight"][idx] = w
                arr["distance"][idx] = d
                chunk.dirty_stamp = m.stamp
                return True

            linewalk.walk_segment_keys(m, ray_start, ray_end, visit, flags=0)
        return n_rays
