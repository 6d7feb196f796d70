"""Ray patterns and clearing patterns.

Reference parity: ohm/RayPattern.{h,cpp}, ohm/RayPatternConical.cpp,
ohm/ClearingPattern.h — precomputed ray fans transformed to a pose and
applied to any ray mapper, typically with the clearing flag set so dynamic
obstacles decay without eroding intervening space.
"""

from __future__ import annotations

import numpy as np

from ohm_tpu.core.rayflags import RayFlag


class RayPattern:
    """A set of origin/end ray pairs in the pattern's local frame."""

    def __init__(self):
        self.rays = np.zeros((0, 3), dtype=np.float64)  # interleaved start/end

    @property
    def ray_count(self) -> int:
        return self.rays.shape[0] // 2

    def add_ray(self, start, end):
        self.rays = np.concatenate([self.rays, np.asarray([start, end], dtype=np.float64)])

    def add_points(self, points, origin=(0.0, 0.0, 0.0)):
        """Add rays from a common origin to each point (reference: addPoints)."""
        points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        rays = np.empty((2 * len(points), 3))
        rays[0::2] = np.asarray(origin, dtype=np.float64)
        rays[1::2] = points
        self.rays = np.concatenate([self.rays, rays])

    def build_rays(self, position, rotation=None):
        """Transform pattern rays to a pose (reference: RayPattern::buildRays).

        rotation: 3x3 matrix or None.  Returns interleaved (2N, 3) rays.
        """
        rays = self.rays
        if rotation is not None:
            rays = rays @ np.asarray(rotation, dtype=np.float64).T
        return rays + np.asarray(position, dtype=np.float64)


class RayPatternConical(RayPattern):
    """Conical fan of rays (reference: ohm/RayPatternConical.cpp:20-60)."""

    def __init__(self, cone_axis, cone_angle: float, range_: float,
                 angular_resolution: float, min_range: float = 0.0):
        super().__init__()
        axis = np.asarray(cone_axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        self.add_ray(axis * min_range, axis * range_)
        # Perpendicular base via component swizzle, as in the reference.
        deflect_base = np.array([axis[2], axis[0], axis[1]])
        deflect_base = deflect_base - axis * np.dot(deflect_base, axis)
        deflect_base /= np.linalg.norm(deflect_base)
        third = np.cross(axis, deflect_base)
        n_rings = max(1, int(np.ceil(cone_angle / angular_resolution)))
        for ring in range(1, n_rings + 1):
            theta = cone_angle * ring / n_rings
            ring_radius_angle = np.sin(theta)
            n_in_ring = max(1, int(np.ceil(2 * np.pi * ring_radius_angle / angular_resolution)))
            for i in range(n_in_ring):
                phi = 2 * np.pi * i / n_in_ring
                d = (np.cos(theta) * axis
                     + np.sin(theta) * (np.cos(phi) * deflect_base + np.sin(phi) * third))
                self.add_ray(d * min_range, d * range_)


class ClearingPattern:
    """Applies a RayPattern with clearing semantics (reference: ohm/ClearingPattern.h).

    Default flags degrade only the first occupied voxel along each ray and
    halt; free/unobserved voxels are untouched (ClearingPattern.h:44-45).
    """

    DEFAULT_RAY_FLAGS = (RayFlag.END_POINT_AS_FREE | RayFlag.STOP_ON_FIRST_OCCUPIED
                         | RayFlag.EXCLUDE_FREE | RayFlag.EXCLUDE_UNOBSERVED)

    def __init__(self, pattern: RayPattern):
        self.pattern = pattern
        self.ray_flags = int(self.DEFAULT_RAY_FLAGS)
        self.last_rays = None

    def apply(self, mapper, position, rotation=None):
        """Apply to any ray mapper (CPU oracle or TPU mapper)."""
        rays = self.pattern.build_rays(position, rotation)
        self.last_rays = rays
        return mapper.integrate_rays(rays, ray_update_flags=self.ray_flags)
