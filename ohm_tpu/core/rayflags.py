"""Ray integration behaviour flags and ray filter result flags.

Reference parity: ohm/RayFlag.h:16-59, ohm/RayFilter.h:24-28.
"""

from __future__ import annotations

from enum import IntFlag


class RayFlag(IntFlag):
    """Per-integrateRays behaviour flags (reference: ohm/RayFlag.h)."""

    DEFAULT = 0
    #: Treat the sample point as a free voxel (miss), not a hit.
    END_POINT_AS_FREE = 1 << 0
    #: Stop traversing a ray at the first initially-occupied voxel.
    STOP_ON_FIRST_OCCUPIED = 1 << 1
    #: Do not update the voxel containing the ray origin.
    EXCLUDE_ORIGIN = 1 << 2
    #: Do not update the voxel containing the sample point.
    EXCLUDE_SAMPLE = 1 << 3
    #: Do not update voxels along the ray (sample update may still apply).
    EXCLUDE_RAY = 1 << 4
    #: Do not modify voxels that are currently unobserved.
    EXCLUDE_UNOBSERVED = 1 << 5
    #: Do not modify voxels that are currently free.
    EXCLUDE_FREE = 1 << 6
    #: Do not modify voxels that are currently occupied.
    EXCLUDE_OCCUPIED = 1 << 7
    #: Trace rays sample -> origin to decorrelate write contention.
    REVERSE_WALK = 1 << 8
    #: Internal flag space (reference: ohm/RayFlag.h:57-59).
    INTERNAL = 1 << 16
    INTERNAL_TIMESTAMPS = INTERNAL


class RayFilterFlag(IntFlag):
    """Ray filter result bits (reference: ohm/RayFilter.h:24-28)."""

    INVALID = 1 << 0
    CLIPPED_START = 1 << 1
    CLIPPED_END = 1 << 2
