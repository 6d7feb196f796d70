"""Voxel key / coordinate quantisation math (vectorised, float64 host side).

Reference parity:
- ohm/MapCoord.h:37-93  (pointToRegionCoord, pointToRegionVoxel, regionCentreCoord)
- ohm/MapRegion.cpp:32-69 (MapRegion construction + voxelKey quantisation)
- ohm/OccupancyMap.h:757-778 (voxelCentre)
- ohm/MapChunk.h:33-56 (voxelIndex linearisation)
- ohm/Key.h (region int16 x3 + local uint8 x3 key model)

A voxel address is (region_key int16[3], local_key uint8[3]).  This module
also provides the *absolute voxel coordinate* form ``abs = region * dims +
local`` (int32 per axis) which the TPU kernels use: it makes the DDA a plain
integer walk with no region/local carry logic.  With int16 regions and <=256
voxels per region axis, abs fits comfortably in int32.

All functions are vectorised over leading axes and operate in float64; TPU
device code receives pre-quantised keys + voxel-local float32 frames
(reference precision model: docs/gpu/docgpudetail.md:68-74).
"""

from __future__ import annotations

import numpy as np

#: Epsilon used to absorb floating point error when a point lands marginally
#: outside its region's spatial bounds (reference: ohm/MapCoord.h:45-80).
REGION_COORD_EPSILON = 1e-6

#: Region coordinate marking a null/invalid key (reference: ohm/Key.cpp "INVALID_VALUE").
NULL_REGION_COORD = -32768


def point_to_region_coord(coord, region_size):
    """Quantise map-local coordinates to region coordinates.

    Regions are centred on ``coord * region_size`` so the region spans
    ``[centre - size/2, centre + size/2)`` (reference: ohm/MapCoord.h:85-93).
    """
    return np.floor(np.asarray(coord, dtype=np.float64) / region_size + 0.5).astype(np.int32)


def region_centre_coord(region_coord, region_size):
    """Centre coordinate of a region along one axis (reference: ohm/MapCoord.h:37-40)."""
    return np.asarray(region_coord, dtype=np.float64) * region_size


def point_to_region_voxel(coord, resolution, region_size):
    """Quantise region-local coordinates to in-region voxel indices.

    ``coord`` is relative to the region *minimum* corner.  Coordinates within
    ``REGION_COORD_EPSILON`` outside [0, region_size) are pulled back inside
    (reference: ohm/MapCoord.h:45-80).
    """
    c = np.asarray(coord, dtype=np.float64).copy()
    c[(c < 0) & (c >= -REGION_COORD_EPSILON)] = 0.0
    sel = (c >= region_size) & (c - REGION_COORD_EPSILON < region_size)
    c[sel] -= REGION_COORD_EPSILON
    return np.floor(c / resolution).astype(np.int32)


def voxel_key(points, origin, region_spatial, region_voxel_dims, resolution):
    """Compute (region_key, local_key) for map-global points.

    Replicates the two-step quantisation of ohm/MapRegion.cpp:32-69 exactly
    (region first, then voxel within the region's min corner frame) so that
    host keys match the reference bit-for-bit.

    points: (..., 3) float64.  Returns (region int32 (...,3), local int32 (...,3)).
    """
    p = np.asarray(points, dtype=np.float64)
    origin = np.asarray(origin, dtype=np.float64)
    region_spatial = np.asarray(region_spatial, dtype=np.float64)
    dims = np.asarray(region_voxel_dims, dtype=np.int32)

    local_pt = p - origin
    region = np.floor(local_pt / region_spatial + 0.5).astype(np.int32)
    region_min = region * region_spatial - 0.5 * region_spatial
    q = local_pt - region_min
    local = np.empty_like(region)
    for axis in range(3):
        local[..., axis] = point_to_region_voxel(q[..., axis], resolution, region_spatial[axis])
    # Clamp pathological out-of-range values (reference returns a null key;
    # callers that need null detection should use voxel_key_checked).
    local = np.clip(local, 0, dims - 1)
    return region, local


def voxel_centre(region, local, origin, region_spatial, resolution):
    """Global centre coordinates of voxels (reference: ohm/OccupancyMap.h:757-778).

    Uses the same operation order as the reference to minimise float error:
    region centre, minus half region, plus origin, plus local offset + half voxel.
    """
    region = np.asarray(region, dtype=np.float64)
    local = np.asarray(local, dtype=np.float64)
    region_spatial = np.asarray(region_spatial, dtype=np.float64)
    centre = region * region_spatial
    centre = centre - 0.5 * region_spatial
    centre = centre + np.asarray(origin, dtype=np.float64)
    centre = centre + local * resolution
    centre = centre + 0.5 * resolution
    return centre


def voxel_index(local, region_voxel_dims):
    """Linearise an in-region local key: x + y*dimx + z*dimx*dimy.

    Reference parity: ohm/MapChunk.h:33-38.  This ordering is load-bearing for
    .ohm serialisation compatibility.
    """
    local = np.asarray(local)
    dims = np.asarray(region_voxel_dims)
    return (local[..., 0] + local[..., 1] * dims[0] + local[..., 2] * dims[0] * dims[1]).astype(np.int64)


def local_key_from_index(index, region_voxel_dims):
    """Inverse of voxel_index (reference: ohm/MapChunk.h voxelLocalKey)."""
    index = np.asarray(index)
    dims = np.asarray(region_voxel_dims)
    x = index % dims[0]
    y = (index % (dims[0] * dims[1])) // dims[0]
    z = index // (dims[0] * dims[1])
    return np.stack([x, y, z], axis=-1).astype(np.int32)


def key_to_abs(region, local, region_voxel_dims):
    """Absolute voxel coordinate: region * dims + local (int32, per axis)."""
    return (np.asarray(region, dtype=np.int64) * np.asarray(region_voxel_dims, dtype=np.int64)
            + np.asarray(local, dtype=np.int64)).astype(np.int32)


def abs_to_key(abs_coord, region_voxel_dims):
    """Split an absolute voxel coordinate back into (region, local)."""
    a = np.asarray(abs_coord, dtype=np.int64)
    dims = np.asarray(region_voxel_dims, dtype=np.int64)
    region = np.floor_divide(a, dims)
    local = a - region * dims
    return region.astype(np.int32), local.astype(np.int32)


def pack_region_key(region):
    """Pack an int16x3 region key into a single int64 (16 bits per axis).

    Used as the hash key for the host region dictionary and the device region
    table.  The packing keeps region coordinates recoverable via
    unpack_region_key.
    """
    r = np.asarray(region, dtype=np.int64)
    return ((r[..., 0] & 0xFFFF) | ((r[..., 1] & 0xFFFF) << 16) | ((r[..., 2] & 0xFFFF) << 32))


def unpack_region_key(packed):
    """Inverse of pack_region_key (sign-extends each 16-bit field)."""
    p = np.asarray(packed, dtype=np.int64)
    out = np.empty(p.shape + (3,), dtype=np.int32)
    for axis in range(3):
        field = (p >> (16 * axis)) & 0xFFFF
        out[..., axis] = ((field + 0x8000) & 0xFFFF) - 0x8000
    return out


def range_between(region_a, local_a, region_b, local_b, region_voxel_dims):
    """Signed voxel-count difference b - a per axis.

    Reference parity: OccupancyMap::rangeBetween (ohm/OccupancyMap.cpp) /
    KeyRange extents, used by the heightmap walkers and key iteration.
    """
    a = key_to_abs(np.asarray(region_a), np.asarray(local_a), region_voxel_dims)
    b = key_to_abs(np.asarray(region_b), np.asarray(local_b), region_voxel_dims)
    return b - a


def key_range(min_region, min_local, max_region, max_local, region_voxel_dims):
    """All (region, local) keys in the inclusive box [min_key, max_key],
    x-fastest (reference: ohm/KeyRange.h iteration order).

    Returns (regions [N,3] int32, locals [N,3] uint8).  Sized for query/
    heightmap extents — not for streaming whole maps.
    """
    diff = range_between(min_region, min_local, max_region, max_local,
                         region_voxel_dims) + 1
    if np.any(diff <= 0):
        return (np.zeros((0, 3), np.int32), np.zeros((0, 3), np.uint8))
    base = key_to_abs(np.asarray(min_region), np.asarray(min_local), region_voxel_dims)
    zz, yy, xx = np.meshgrid(np.arange(diff[2]), np.arange(diff[1]),
                             np.arange(diff[0]), indexing="ij")
    abs_coords = base + np.column_stack([xx.ravel(), yy.ravel(), zz.ravel()])
    return abs_to_key(abs_coords, region_voxel_dims)
