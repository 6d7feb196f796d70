"""ClearanceProcess: per-voxel range to the nearest occupied voxel.

Reference parity: ohmgpu/ClearanceProcess.{h,cpp} + the ROI flood-fill
kernel ohmgpu/gpu/RoiRangeFill.cl (per-voxel-thread iterative neighbour
propagation).  TPU-native design: clearance is an exact Euclidean distance
transform, and a bounded-radius squared EDT is separable —
``D(p) = min_q occupied (|p-q|^2)`` decomposes into three axis passes of
``min_s (D(x+s) + s^2 res^2)`` — which maps to vectorised rolls over a dense
ROI box instead of a flood fill.  Regions are assembled with a halo of the
search radius so cross-region obstacles are seen, mirroring the reference's
ROI border handling.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ohm_tpu.core import keys as keymath
from ohm_tpu.core.layout import OCCUPANCY_LAYER, CLEARANCE_LAYER

#: Query flag: treat unobserved voxels as obstacles
#: (reference: ohm/QueryFlag.h kQfUnknownAsOccupied).
UNKNOWN_AS_OCCUPIED = 1 << 0

_BIG = jnp.float32(3.0e38)


def _edt_pass(dist2, radius_vox, step2, axis):
    """One separable squared-EDT axis pass with bounded radius."""

    def body(acc, s):
        shift_pos = jnp.roll(dist2, s, axis=axis)
        shift_neg = jnp.roll(dist2, -s, axis=axis)
        # Mask wrap-around: rolled-in values come from the opposite face;
        # the halo (>= radius) makes wrapped values irrelevant as long as the
        # box is padded by radius_vox, which _build_box guarantees.
        cand = jnp.minimum(shift_pos, shift_neg) + (s.astype(jnp.float32) ** 2) * step2
        return jnp.minimum(acc, cand), None

    acc, _ = jax.lax.scan(body, dist2, jnp.arange(1, radius_vox + 1))
    return acc


def _edt(occupied, radius_vox, resolution):
    """Squared EDT of a boolean grid, exact within radius_vox."""
    step2 = jnp.float32(resolution * resolution)
    d2 = jnp.where(occupied, jnp.float32(0), _BIG)
    for axis in range(3):
        d2 = _edt_pass(d2, radius_vox, step2, axis)
    return d2


_edt_jit = jax.jit(_edt, static_argnames=("radius_vox", "resolution"))


@functools.partial(jax.jit, static_argnames=("shape", "radius_vox",
                                             "resolution", "radius",
                                             "lo", "size"))
def _edt_packed_jit(occ_bits, shape, radius_vox, resolution, radius,
                    lo, size):
    """EDT from a PACKED bit plane, clearance finished on device, interior
    slice selected on device — the tunnel is the cost (docs/PERF.md), so the
    upload ships 1 bit/voxel and the readback only the non-halo interior.

    ``occ_bits`` u8[ceil(N/8)] packs the flat C-order box; ``lo``/``size``
    (static tuples) bound the interior.  Returns f32 clearance of the
    interior box (-1 where nothing within radius)."""
    n = shape[0] * shape[1] * shape[2]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # np.packbits bit order
    bits = (occ_bits[:, None] >> shifts[None, :]) & 1
    occupied = bits.reshape(-1)[:n].reshape(shape) != 0
    d2 = _edt(occupied, radius_vox, resolution)
    clearance = jnp.sqrt(jnp.minimum(d2, _BIG))
    clearance = jnp.where((d2 < 1e30) & (clearance <= jnp.float32(radius)),
                          clearance, jnp.float32(-1.0))
    return jax.lax.slice(clearance, lo, tuple(l + s for l, s in zip(lo, size)))


class ClearanceProcess:
    """Computes the clearance layer for map regions (MappingProcess-style)."""

    #: Memory cap for one dense EDT box (voxels).  Larger extents are split
    #: into overlapping halo tiles (reference analogue: ClearanceProcess's
    #: per-dirty-region ROI batching keeps GPU memory bounded).
    max_box_voxels = 256 ** 3

    def __init__(self, map_obj, search_radius: float = 1.0, query_flags: int = 0):
        self.map = map_obj
        self.search_radius = float(search_radius)
        self.query_flags = query_flags
        map_obj.layout.add_clearance()
        map_obj.ensure_chunk_layers()
        self._processed_stamps: dict = {}

    def update(self, region_keys=None, force: bool = False):
        """Compute clearance for the given regions (default: all dirty regions).

        Arbitrarily large extents are processed in overlapping halo tiles:
        regions are grouped into spatial tiles whose halo-padded dense box
        stays under ``max_box_voxels``; each tile's EDT sees obstacles up to
        search_radius beyond its border, so tiling is exact.
        """
        m = self.map
        if region_keys is None:
            region_keys = [k for k, c in m.chunks.items()
                           if force or self._processed_stamps.get(k, -1) < c.dirty_stamp]
        region_keys = [tuple(int(v) for v in k) for k in region_keys]
        if not region_keys:
            return 0

        dims = m.region_voxel_dims
        res = m.resolution
        radius_vox = max(1, int(math.ceil(self.search_radius / res)))
        halo_regions = int(math.ceil(radius_vox / float(dims.min())))

        # Tile size (in regions per axis) such that the halo-padded box fits.
        edge_budget = int(self.max_box_voxels ** (1.0 / 3.0)) // int(dims.max())
        tile_regions = max(1, edge_budget - 2 * halo_regions)

        groups: dict = {}
        for key in region_keys:
            tile = tuple(int(np.floor(k / tile_regions)) for k in key)
            groups.setdefault(tile, []).append(key)
        total = 0
        for group in groups.values():
            total += self._update_box(group, radius_vox, halo_regions)
        return total

    def _update_box(self, region_keys, radius_vox, halo_regions):
        """Dense EDT over one halo-padded box of regions."""
        m = self.map
        dims = m.region_voxel_dims
        res = m.resolution

        keys_arr = np.array(region_keys, dtype=np.int64)
        rmin = keys_arr.min(axis=0)
        rmax = keys_arr.max(axis=0)
        # Halo in whole regions so neighbouring obstacles are visible.
        bmin = rmin - halo_regions
        bmax = rmax + halo_regions
        box_regions = bmax - bmin + 1
        box_vox = box_regions * np.asarray(dims, dtype=np.int64)

        occ_idx = m.layer_index(OCCUPANCY_LAYER)
        clear_idx = m.layer_index(CLEARANCE_LAYER)
        threshold = np.float32(m.occupancy_threshold_value)

        occupied = np.zeros(tuple(box_vox), dtype=bool)
        unknown_occ = bool(self.query_flags & UNKNOWN_AS_OCCUPIED)
        if unknown_occ:
            occupied[:] = True  # anything not covered by a chunk is unobserved
        for key, chunk in m.chunks.items():
            rk = np.asarray(key, np.int64)
            if np.any(rk < bmin) or np.any(rk > bmax):
                continue
            occ = chunk.layers[occ_idx][OCCUPANCY_LAYER].reshape(dims[2], dims[1], dims[0]).transpose(2, 1, 0)
            mask = np.isfinite(occ) & (occ >= threshold)
            if unknown_occ:
                mask = mask | ~np.isfinite(occ)
            o = (rk - bmin) * dims
            occupied[o[0]:o[0] + dims[0], o[1]:o[1] + dims[1], o[2]:o[2] + dims[2]] = mask

        # Transfer diet (round 4; the tunnel dominates this whole process):
        # ship 1 bit/voxel up (np.packbits) and read back only the non-halo
        # interior, finished (sqrt + radius threshold) on device.
        lo = tuple(int(v) for v in (rmin - bmin) * dims)
        size = tuple(int(v) for v in (rmax - rmin + 1) * dims)
        bits = np.packbits(occupied.reshape(-1))
        clearance = np.asarray(_edt_packed_jit(
            jnp.asarray(bits), tuple(int(v) for v in box_vox), radius_vox,
            float(res), float(self.search_radius), lo, size))

        for key in region_keys:
            chunk = m.region(key, allow_create=True)
            o = (np.asarray(key, np.int64) - rmin) * dims
            block = clearance[o[0]:o[0] + dims[0], o[1]:o[1] + dims[1], o[2]:o[2] + dims[2]]
            chunk.layers[clear_idx][CLEARANCE_LAYER] = block.transpose(2, 1, 0).reshape(-1)
            self._processed_stamps[key] = chunk.dirty_stamp
        return len(region_keys)
