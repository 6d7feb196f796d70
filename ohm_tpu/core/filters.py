"""Vectorised ray filters: validate / clip ray batches before integration.

Reference parity: ohm/RayFilter.{h,cpp} (goodRayFilter, clipRayFilter,
clipBounded, clipToBounds).  Unlike the reference's per-ray callbacks, these
operate on whole (N, 3) batches and return an accept mask plus per-ray filter
flags, which is the form the TPU pipeline consumes.
"""

from __future__ import annotations

import numpy as np

from ohm_tpu.core.rayflags import RayFilterFlag


def good_ray_filter(starts, ends, max_range: float = 0.0):
    """Reject NaN/inf rays and rays longer than max_range.

    Returns (starts, ends, flags, accept) — endpoints unmodified
    (reference: ohm/RayFilter.cpp:12-34).
    """
    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)
    flags = np.zeros(starts.shape[0], dtype=np.uint32)
    finite = np.isfinite(starts).all(axis=-1) & np.isfinite(ends).all(axis=-1)
    ray = ends - starts
    length_sqr = np.einsum("ij,ij->i", ray, ray)
    good = finite
    if max_range > 0:
        good = good & (length_sqr <= max_range * max_range)
    flags[~good] |= RayFilterFlag.INVALID
    return starts, ends, flags, good


def clip_ray_filter(starts, ends, max_length: float):
    """Clip rays longer than max_length to that length; reject NaN/inf rays.

    Reference parity: ohm/RayFilter.cpp:37-58.
    """
    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64).copy()
    flags = np.zeros(starts.shape[0], dtype=np.uint32)
    good = np.isfinite(starts).all(axis=-1) & np.isfinite(ends).all(axis=-1)
    ray = ends - starts
    length_sqr = np.einsum("ij,ij->i", ray, ray)
    if max_length > 0:
        too_long = good & (length_sqr > max_length * max_length)
        if too_long.any():
            scale = max_length / np.sqrt(length_sqr[too_long])
            ends[too_long] = starts[too_long] + ray[too_long] * scale[:, None]
            flags[too_long] |= RayFilterFlag.CLIPPED_END
    flags[~good] |= RayFilterFlag.INVALID
    return starts, ends, flags, good


def _clip_line_to_box(starts, ends, box_min, box_max):
    """Liang–Barsky segment/AABB clip, vectorised.

    Returns (clipped_starts, clipped_ends, clipped_start_mask, clipped_end_mask,
    intersects_mask).  Mirrors ohm/Aabb.h clipLine semantics: endpoints are
    moved onto the box surface when outside.
    """
    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)
    d = ends - starts
    t0 = np.zeros(starts.shape[0])
    t1 = np.ones(starts.shape[0])
    ok = np.ones(starts.shape[0], dtype=bool)
    for axis in range(3):
        da = d[:, axis]
        sa = starts[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            tlo = (box_min[axis] - sa) / da
            thi = (box_max[axis] - sa) / da
        tmin = np.minimum(tlo, thi)
        tmax = np.maximum(tlo, thi)
        parallel = da == 0
        inside = (sa >= box_min[axis]) & (sa <= box_max[axis])
        tmin = np.where(parallel, np.where(inside, -np.inf, np.inf), tmin)
        tmax = np.where(parallel, np.where(inside, np.inf, -np.inf), tmax)
        t0 = np.maximum(t0, tmin)
        t1 = np.minimum(t1, tmax)
    ok &= t0 <= t1
    clipped_start = ok & (t0 > 0)
    clipped_end = ok & (t1 < 1)
    new_starts = np.where(clipped_start[:, None], starts + d * t0[:, None], starts)
    new_ends = np.where(clipped_end[:, None], starts + d * t1[:, None], ends)
    return new_starts, new_ends, clipped_start, clipped_end, ok


def clip_bounded_filter(starts, ends, box_min, box_max):
    """Clip rays to an AABB, rejecting rays fully outside.

    Reference parity: ohm/RayFilter.cpp:60-78 (clipBounded).
    """
    box_min = np.asarray(box_min, dtype=np.float64)
    box_max = np.asarray(box_max, dtype=np.float64)
    new_starts, new_ends, cs, ce, ok = _clip_line_to_box(starts, ends, box_min, box_max)
    flags = np.zeros(np.asarray(starts).shape[0], dtype=np.uint32)
    flags[cs] |= RayFilterFlag.CLIPPED_START
    flags[ce] |= RayFilterFlag.CLIPPED_END
    return new_starts, new_ends, flags, ok
