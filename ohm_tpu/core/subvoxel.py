"""Packed sub-voxel quantisation codecs: voxel-mean coords, incident normals,
touch times.

Reference parity: ohm/VoxelMeanCompute.h (10-bit/axis mean pattern),
ohm/VoxelIncidentCompute.h (15+15-bit normal), ohm/VoxelTouchTimeCompute.h
(ms-since-timebase).  All functions are vectorised numpy; arithmetic is
float32 to match the reference (which runs these in ``float`` on both CPU
and GPU).
"""

from __future__ import annotations

import numpy as np

MEAN_BITS_PER_AXIS = 10
MEAN_POSITIONS = (1 << MEAN_BITS_PER_AXIS) - 1  # 1023
MEAN_USED_BIT = np.uint32(1 << 31)

NORMAL_QUAT = np.float32(16383.0)
NORMAL_MASK = np.uint32(0x3FFF)
NORMAL_SHIFT_X = 0
NORMAL_SHIFT_Y = 15
NORMAL_SET_BIT = np.uint32(1 << 30)
NORMAL_SIGN_BIT_Z = np.uint32(1 << 31)

TOUCH_TIME_SCALE = 0.001  # encode as milliseconds (ohm/VoxelTouchTimeCompute.h:18)


def sub_voxel_coord(local_coord, resolution):
    """Quantise voxel-centre-relative coordinates to the packed mean pattern.

    Reference parity: ohm/VoxelMeanCompute.h:69-92 (subVoxelCoord).
    local_coord: (..., 3) in [-res/2, res/2]; returns uint32 pattern(s).
    """
    c = np.asarray(local_coord, dtype=np.float32)
    res = np.float32(resolution)
    mean_res = res / np.float32(MEAN_POSITIONS)
    offset = np.float32(0.5) * res
    # pointToRegionCoord(x + offset, mean_res) = floor(x/mean_res + 0.5)
    pos = np.floor((c + offset) / mean_res + np.float32(0.5)).astype(np.int64)
    pos = np.where(pos >= 0, np.where(pos < (1 << MEAN_BITS_PER_AXIS), pos, MEAN_POSITIONS), 0)
    pattern = (pos[..., 0].astype(np.uint32)
               | (pos[..., 1].astype(np.uint32) << MEAN_BITS_PER_AXIS)
               | (pos[..., 2].astype(np.uint32) << (2 * MEAN_BITS_PER_AXIS)))
    return pattern | MEAN_USED_BIT


def sub_voxel_to_local_coord(pattern, resolution):
    """Unpack a mean pattern to voxel-centre-relative coordinates.

    Reference parity: ohm/VoxelMeanCompute.h:102-122.  An unused pattern
    (bit 31 clear) decodes to (0, 0, 0)... note the reference checks the
    constant `used_bit` rather than the pattern bit here; we check the
    pattern bit, which is the evident intent (patterns produced by
    subVoxelCoord always carry the bit).
    """
    p = np.asarray(pattern, dtype=np.uint32)
    res = np.float32(resolution)
    mean_res = res / np.float32(MEAN_POSITIONS)
    offset = np.float32(0.5) * res
    used = (p & MEAN_USED_BIT) != 0
    out = np.zeros(p.shape + (3,), dtype=np.float32)
    for axis in range(3):
        q = ((p >> np.uint32(axis * MEAN_BITS_PER_AXIS)) & np.uint32(MEAN_POSITIONS)).astype(np.int32)
        out[..., axis] = np.where(used, q.astype(np.float32) * mean_res - offset, np.float32(0))
    return out


def sub_voxel_update(pattern, count, local_coord, resolution):
    """Progressive mean update (reference: ohm/VoxelMeanCompute.h:134-152)."""
    mean = sub_voxel_to_local_coord(pattern, resolution)
    c = np.asarray(local_coord, dtype=np.float32)
    count = np.asarray(count, dtype=np.float32)
    one_on = np.asarray(np.float32(1.0) / (count + np.float32(1.0)), dtype=np.float32)
    if one_on.ndim == c.ndim - 1:
        one_on = one_on[..., None]
    new_mean = mean + (c - mean) * one_on
    return sub_voxel_coord(new_mean, resolution)


def decode_normal(packed):
    """Unpack a quantised incident normal (reference: ohm/VoxelIncidentCompute.h:35-53)."""
    p = np.asarray(packed, dtype=np.uint32)
    nx = (np.float32(2.0) * (((p >> np.uint32(NORMAL_SHIFT_X)) & NORMAL_MASK).astype(np.float32) / NORMAL_QUAT)
          - np.float32(1.0))
    ny = (np.float32(2.0) * (((p >> np.uint32(NORMAL_SHIFT_Y)) & NORMAL_MASK).astype(np.float32) / NORMAL_QUAT)
          - np.float32(1.0))
    nx = np.clip(nx, -1.0, 1.0).astype(np.float32)
    ny = np.clip(ny, -1.0, 1.0).astype(np.float32)
    nz2 = np.clip(np.float32(1.0) - (nx * nx + ny * ny), -1.0, 1.0).astype(np.float32)
    has = (p & NORMAL_SET_BIT) != 0
    nx = np.where(has, nx, np.float32(0))
    ny = np.where(has, ny, np.float32(0))
    nz = np.where(has, np.sqrt(np.maximum(nz2, 0).astype(np.float32)), np.float32(0))
    nz = np.where((p & NORMAL_SIGN_BIT_Z) != 0, -nz, nz)
    return np.stack([nx, ny, nz], axis=-1).astype(np.float32)


def encode_normal(normal):
    """Pack a normal vector (reference: ohm/VoxelIncidentCompute.h:68-89)."""
    n = np.asarray(normal, dtype=np.float32)
    x = np.float32(0.5) * (np.clip(n[..., 0], -1.0, 1.0).astype(np.float32) + np.float32(1.0))
    y = np.float32(0.5) * (np.clip(n[..., 1], -1.0, 1.0).astype(np.float32) + np.float32(1.0))
    xi = (x * NORMAL_QUAT).astype(np.uint32) & NORMAL_MASK
    yi = (y * NORMAL_QUAT).astype(np.uint32) & NORMAL_MASK
    packed = (xi << np.uint32(NORMAL_SHIFT_X)) | (yi << np.uint32(NORMAL_SHIFT_Y))
    packed &= ~(NORMAL_SET_BIT | NORMAL_SIGN_BIT_Z)
    packed |= np.where(n[..., 2] < 0, NORMAL_SIGN_BIT_Z, np.uint32(0))
    nonzero = (n[..., 0] != 0) | (n[..., 1] != 0) | (n[..., 2] != 0)
    packed |= np.where(nonzero, NORMAL_SET_BIT, np.uint32(0))
    return packed.astype(np.uint32)


def update_incident_normal(packed, incident_ray, point_count):
    """Progressive incident-normal update (reference: ohm/VoxelIncidentCompute.h:91-112).

    ``incident_ray`` points sample -> sensor (start - end).
    """
    normal = decode_normal(packed)
    ray = np.asarray(incident_ray, dtype=np.float32)
    count = np.asarray(point_count, dtype=np.int64)
    has_normal = (normal != 0).any(axis=-1)
    count = np.where(has_normal & (count > 0), count, 0)
    one_on = np.asarray(np.float32(1.0) / (count + 1).astype(np.float32), dtype=np.float32)
    len2 = np.sum(ray * ray, axis=-1).astype(np.float32)
    inv_len = np.asarray(np.where(len2 > np.float32(1e-6), 1.0 / np.sqrt(len2), 0.0), dtype=np.float32)
    if inv_len.ndim == ray.ndim - 1:
        inv_len = inv_len[..., None]
    if one_on.ndim == ray.ndim - 1:
        one_on = one_on[..., None]
    ray = ray * inv_len
    normal = normal + (ray - normal) * one_on
    nlen2 = np.sum(normal * normal, axis=-1).astype(np.float32)
    inv_n = np.asarray(np.where(nlen2 > np.float32(1e-6), 1.0 / np.sqrt(nlen2), 0.0), dtype=np.float32)
    if inv_n.ndim == normal.ndim - 1:
        inv_n = inv_n[..., None]
    normal = normal * inv_n
    return encode_normal(normal)


def encode_touch_time(timebase, timestamp):
    """Milliseconds since timebase (reference: ohm/VoxelTouchTimeCompute.h:24-27)."""
    return ((np.asarray(timestamp, dtype=np.float64) - timebase) / TOUCH_TIME_SCALE).astype(np.uint32)


def decode_touch_time(timebase, touch_time):
    return np.asarray(touch_time, dtype=np.float64) * TOUCH_TIME_SCALE + timebase
