"""JAX device versions of the packed sub-voxel codecs.

Mirrors ohm_tpu.core.subvoxel (reference: ohm/VoxelMeanCompute.h,
ohm/VoxelIncidentCompute.h) in jnp float32/uint32 so voxel-mean and
incident-normal layers can be updated on device.
"""

from __future__ import annotations

import jax.numpy as jnp

MEAN_BITS_PER_AXIS = 10
MEAN_POSITIONS = (1 << MEAN_BITS_PER_AXIS) - 1
MEAN_USED_BIT = jnp.uint32(1 << 31)

NORMAL_QUAT = jnp.float32(16383.0)
NORMAL_MASK = jnp.uint32(0x3FFF)
NORMAL_SET_BIT = jnp.uint32(1 << 30)
NORMAL_SIGN_BIT_Z = jnp.uint32(1 << 31)


def sub_voxel_coord(local_coord, resolution):
    """Pack voxel-centre-relative coords -> uint32 pattern (ohm/VoxelMeanCompute.h:69-92)."""
    res = jnp.float32(resolution)
    mean_res = res / jnp.float32(MEAN_POSITIONS)
    offset = jnp.float32(0.5) * res
    pos = jnp.floor((local_coord + offset) / mean_res + jnp.float32(0.5)).astype(jnp.int32)
    pos = jnp.clip(pos, 0, MEAN_POSITIONS).astype(jnp.uint32)
    pattern = pos[..., 0] | (pos[..., 1] << MEAN_BITS_PER_AXIS) | (pos[..., 2] << (2 * MEAN_BITS_PER_AXIS))
    return pattern | MEAN_USED_BIT


def sub_voxel_to_local_coord(pattern, resolution):
    """Unpack a mean pattern -> (...,3) f32 (ohm/VoxelMeanCompute.h:102-122)."""
    res = jnp.float32(resolution)
    mean_res = res / jnp.float32(MEAN_POSITIONS)
    offset = jnp.float32(0.5) * res
    used = (pattern & MEAN_USED_BIT) != 0
    axes = []
    for axis in range(3):
        q = ((pattern >> jnp.uint32(axis * MEAN_BITS_PER_AXIS)) & jnp.uint32(MEAN_POSITIONS)).astype(jnp.float32)
        axes.append(jnp.where(used, q * mean_res - offset, jnp.float32(0)))
    return jnp.stack(axes, axis=-1)


def decode_normal(packed):
    """Unpack incident normal (ohm/VoxelIncidentCompute.h:35-53)."""
    nx = 2.0 * ((packed & NORMAL_MASK).astype(jnp.float32) / NORMAL_QUAT) - 1.0
    ny = 2.0 * (((packed >> jnp.uint32(15)) & NORMAL_MASK).astype(jnp.float32) / NORMAL_QUAT) - 1.0
    nx = jnp.clip(nx, -1.0, 1.0)
    ny = jnp.clip(ny, -1.0, 1.0)
    nz2 = jnp.clip(1.0 - (nx * nx + ny * ny), -1.0, 1.0)
    has = (packed & NORMAL_SET_BIT) != 0
    nx = jnp.where(has, nx, 0.0)
    ny = jnp.where(has, ny, 0.0)
    nz = jnp.where(has, jnp.sqrt(jnp.maximum(nz2, 0.0)), 0.0)
    nz = jnp.where((packed & NORMAL_SIGN_BIT_Z) != 0, -nz, nz)
    return jnp.stack([nx, ny, nz], axis=-1).astype(jnp.float32)


def encode_normal(normal):
    """Pack a normal vector (ohm/VoxelIncidentCompute.h:68-89)."""
    x = 0.5 * (jnp.clip(normal[..., 0], -1.0, 1.0) + 1.0)
    y = 0.5 * (jnp.clip(normal[..., 1], -1.0, 1.0) + 1.0)
    xi = (x * NORMAL_QUAT).astype(jnp.uint32) & NORMAL_MASK
    yi = (y * NORMAL_QUAT).astype(jnp.uint32) & NORMAL_MASK
    packed = xi | (yi << jnp.uint32(15))
    packed = packed & ~(NORMAL_SET_BIT | NORMAL_SIGN_BIT_Z)
    packed = packed | jnp.where(normal[..., 2] < 0, NORMAL_SIGN_BIT_Z, jnp.uint32(0))
    nonzero = (normal[..., 0] != 0) | (normal[..., 1] != 0) | (normal[..., 2] != 0)
    packed = packed | jnp.where(nonzero, NORMAL_SET_BIT, jnp.uint32(0))
    return packed
