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


def normalize_reverse_walk(ray_update_flags: int) -> int:
    """Resolve REVERSE_WALK: accept-and-strip, or reject the one
    order-dependent combination.

    The reference traces sample->sensor to decorrelate CAS write contention
    (docs/gpu/docgpudetail.md:46-50); its walk SWAPS start/end keys first so
    every per-voxel computation sees identical geometry
    (ohmgpu/gpu/LineWalk.cl:245-263 end-voxel-centred frame either way;
    TsdfUpdate.cl:139 diffs against the swapped key) — reverse walk changes
    only the ITERATION order, which CAS races already made nondeterministic.
    This pipeline's sort-reduce integration has no write contention and fixes
    one deterministic per-voxel order (original ray index), so the flag is
    accepted and stripped: exact parity, one compiled program variant.

    With STOP_ON_FIRST_OCCUPIED the walk order becomes semantic (stopping
    scans from the sample end instead of the origin); the reference strips
    REVERSE_WALK for exactly its stop-on-occupied users
    (ohm/ClearingPattern.cpp:42, ohmgpu/private/RaysQueryDetailGpu.cpp:115),
    so that combination is rejected loudly rather than silently diverging.
    """
    f = int(ray_update_flags)
    if f & RayFlag.REVERSE_WALK:
        if f & RayFlag.STOP_ON_FIRST_OCCUPIED:
            raise ValueError(
                "REVERSE_WALK with STOP_ON_FIRST_OCCUPIED is order-dependent "
                "and unsupported (the reference strips REVERSE_WALK for its "
                "stop-on-occupied users, ohm/ClearingPattern.cpp:42)")
        f &= ~RayFlag.REVERSE_WALK
    return f


class RayFilterFlag(IntFlag):
    """Ray filter result bits (reference: ohm/RayFilter.h:24-28)."""

    INVALID = 1 << 0
    CLIPPED_START = 1 << 1
    CLIPPED_END = 1 << 2
