"""LineKeysQuery: batch DDA voxel key lists for many rays.

Reference parity: ohm/LineKeysQuery.cpp / ohmgpu/LineKeysQueryGpu.cpp
(kernel ohmgpu/gpu/LineKeys.cl:97) — for each ray produce the ordered list
of voxel keys from origin to sample inclusive.

Device design: the shared DDA expands all rays in lock-step; key lists come
back as a padded [B, S, 3] block plus counts, converted to the reference's
flat keys + offsets layout on the host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ohm_tpu.core import keys as keymath
from ohm_tpu.mapping.batch import prepare_ray_batch, max_steps_for
from ohm_tpu.ops.ddawalk import walk_rays
from ohm_tpu.query.base import AsyncQueryMixin


_jit_cache = {}


def _walk_keys(ints, floats, flags, resolution, max_steps):
    start_abs = ints[:, 0:3]
    end_abs = ints[:, 3:6]
    start_frac = floats[:, 0:3]
    direction = floats[:, 3:6]
    length = floats[:, 6]
    walk = walk_rays(start_abs, end_abs, start_frac, direction, length, resolution, max_steps)
    B, S = walk["valid"].shape
    include_end = flags[:, 0] | flags[:, 1]  # final segments
    voxels = jnp.concatenate([walk["voxels"], end_abs[:, None, :]], axis=1)
    valid = jnp.concatenate([walk["valid"], (include_end & flags[:, 3])[:, None]], axis=1)
    counts = valid.sum(axis=1)
    return voxels, valid, counts


class LineKeysQuery(AsyncQueryMixin):
    """Computes per-ray voxel key lists (reference API: ohm/LineKeysQuery.h)."""

    def __init__(self, map_obj):
        self.map = map_obj
        self.rays = np.zeros((0, 3))
        self.result_keys = None  # list of (region, local) arrays per ray
        self.result_counts = None

    def set_rays(self, rays):
        self.rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)

    def execute(self):
        m = self.map
        prepared = prepare_ray_batch(m, self.rays)
        n_rays = self.rays.shape[0] // 2
        if prepared.n_segments == 0:
            self.result_keys = [np.zeros((0, 3), np.int32) for _ in range(n_rays)]
            self.result_counts = np.zeros(n_rays, np.int64)
            return True
        resolution = float(m.resolution)
        max_steps = max_steps_for(0.999 * float(m.region_voxel_dims.min()) * resolution, resolution)
        cache_key = (resolution, max_steps)
        fn = _jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(lambda i, f, g: _walk_keys(i, f, g, resolution, max_steps))
            _jit_cache[cache_key] = fn
        voxels, valid, counts = (np.asarray(x) for x in fn(
            jnp.asarray(prepared.arrays["ints"]), jnp.asarray(prepared.arrays["floats"]),
            jnp.asarray(prepared.arrays["flags"])))

        total = prepared.n_segments
        is_first = prepared.arrays["flags"][:total, 2]
        ray_of = np.cumsum(is_first.astype(np.int64)) - 1
        if m.ray_filter is not None and n_rays:
            _, _, _, accept = m.ray_filter(self.rays[0::2], self.rays[1::2])
        else:
            accept = np.ones(n_rays, dtype=bool)
        out_idx = np.flatnonzero(accept)

        keys_per_ray = [np.zeros((0, 3), np.int32) for _ in range(n_rays)]
        for s in range(total):
            abs_keys = voxels[s][valid[s]]
            r = out_idx[ray_of[s]]
            keys_per_ray[r] = np.concatenate([keys_per_ray[r], abs_keys.astype(np.int32)])
        self.result_keys = keys_per_ray
        self.result_counts = np.array([len(k) for k in keys_per_ray], np.int64)
        return True

    def keys_for(self, ray_index):
        """Keys of one ray as (region [N,3], local [N,3])."""
        return keymath.abs_to_key(self.result_keys[ray_index], self.map.region_voxel_dims)
