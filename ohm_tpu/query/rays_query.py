"""RaysQuery: per-ray range to first occupied voxel + unobserved volume.

Reference parity: ohm/RaysQuery.{h,cpp} and the GPU variant
ohmgpu/gpu/RaysQuery.cl — per visited voxel accumulate
``volume_coefficient * (exit^3 - enter^3)`` while unobserved, track the exit
range while not occupied, stop at the first occupied voxel (strictly greater
than the threshold), and report the terminal voxel's occupancy type.

Device design: rays are segmented and expanded by the shared DDA; occupancy
is gathered per record; the first-occupied logic is a prefix mask over the
step axis; per-segment partials are stitched per ray on the host (segments
of one ray are contiguous in batch order).
"""

from __future__ import annotations

from enum import IntEnum

import numpy as np
import jax
import jax.numpy as jnp

from ohm_tpu.core import keys as keymath
from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots
from ohm_tpu.ops.ddawalk import walk_rays
from ohm_tpu.ops.integrate import _resolve_slots, _unpack_batch, _unobserved
from ohm_tpu.query.base import AsyncQueryMixin


class OccupancyType(IntEnum):
    """Reference: ohm/OccupancyType.h (kNull=-2 .. kOccupied=1)."""

    NULL = -2
    UNOBSERVED = -1
    FREE = 0
    OCCUPIED = 1


def _rays_query_device(arena_state, batch, cfg):
    """Per-segment partial results. Returns (volume, occ_found, range_local,
    terminal_code, end_exit) arrays [B]."""
    base = cfg
    b = _unpack_batch(batch, cfg)
    walk = walk_rays(b["start_abs"], b["end_abs"], b["start_frac"],
                     b["direction"], b["length"], base.resolution, base.max_steps)
    B, S = walk["valid"].shape

    # Extend with the end voxel as a final step (the reference walk includes it).
    end_flat, _ = _resolve_slots(b["end_abs"], b["rmin"], b["corner_slots"], base)
    walk_flat, _ = _resolve_slots(walk["voxels"], b["rmin"], b["corner_slots"], base)
    # Include the end voxel only for final segments (is_sample | end_as_miss);
    # non-final segment boundary voxels belong to the next segment.
    end_step = (b["is_sample"] | b["end_as_miss"]) & b["valid"]

    ids = jnp.concatenate([jnp.where(walk["valid"], walk_flat, base.sentinel),
                           jnp.where(end_step, end_flat, base.sentinel)[:, None]], axis=1)
    enters = jnp.concatenate([walk["enters"], walk["end_enter"][:, None]], axis=1)
    exits = jnp.concatenate([walk["exits"], b["length"][:, None]], axis=1)
    valid = jnp.concatenate([walk["valid"], end_step[:, None]], axis=1) & b["valid"][:, None]

    occ = arena_state["occupancy"][ids]
    unobs = _unobserved(occ, cfg.zero_unobserved)
    occupied = valid & ~unobs & (occ > jnp.float32(cfg.occupancy_threshold))

    # Prefix: steps strictly after the first occupied voxel are not visited.
    occ_prefix = jnp.cumsum(occupied.astype(jnp.int32), axis=1) - occupied.astype(jnp.int32)
    visited = valid & (occ_prefix == 0)

    # Unobserved volume cubes ray-GLOBAL ranges (reference:
    # ohm/RaysQuery.cpp:147-149, RaysQuery.cl:114); segment-local enter/exit
    # must be offset by the segment's start distance t0 before cubing.
    t0 = b["t0"][:, None]
    vol = jnp.where(visited & unobs, (t0 + exits) ** 3 - (t0 + enters) ** 3, 0.0).sum(axis=1)
    # range = exit of the last visited non-occupied voxel.
    not_occ_visit = visited & ~occupied
    range_local = jnp.max(jnp.where(not_occ_visit, exits, 0.0), axis=1)
    occ_found = jnp.any(occupied, axis=1)

    # Terminal voxel = last visited: occupied if found, else the final voxel.
    last_visit_idx = jnp.argmax(
        jnp.where(visited, jnp.arange(S + 1)[None, :], -1), axis=1)
    term_unobs = jnp.take_along_axis(unobs, last_visit_idx[:, None], axis=1)[:, 0]
    term_occ = jnp.take_along_axis(occupied, last_visit_idx[:, None], axis=1)[:, 0]
    terminal = jnp.where(term_unobs, OccupancyType.UNOBSERVED,
                         jnp.where(term_occ, OccupancyType.OCCUPIED, OccupancyType.FREE))
    any_visit = jnp.any(visited, axis=1)
    terminal = jnp.where(any_visit, terminal, OccupancyType.NULL)
    term_vox = jnp.take_along_axis(
        jnp.concatenate([walk["voxels"], b["end_abs"][:, None, :]], axis=1),
        last_visit_idx[:, None, None], axis=1)[:, 0, :]
    return vol, occ_found, range_local, terminal.astype(jnp.int32), term_vox


_device_fn_cache = {}


class RaysQuery(AsyncQueryMixin):
    """Batch ray query (reference API: ohm/RaysQuery.h:23-45)."""

    def __init__(self, map_obj=None, mapper=None, volume_coefficient: float = 1.0):
        self.map = map_obj if map_obj is not None else (mapper.map if mapper else None)
        self.mapper = mapper
        self.volume_coefficient = float(volume_coefficient)
        self.rays = np.zeros((0, 3))
        self.ranges = None
        self.unobserved_volumes = None
        self.terminal_states = None
        self.intersected_voxels = None

    def set_rays(self, rays):
        self.rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)

    def add_rays(self, rays):
        self.rays = np.concatenate([self.rays, np.asarray(rays, dtype=np.float64).reshape(-1, 3)])

    def execute(self):
        from ohm_tpu.mapping.tpu_map import TpuRayMapper

        m = self.map
        mapper = self.mapper
        if mapper is None:
            # Build a transient arena over the map's regions.
            mapper = TpuRayMapper(m, capacity=max(64, m.region_count() + 8))
        prepared = prepare_ray_batch(m, self.rays, segment_length=mapper.segment_length)
        n_rays = self.rays.shape[0] // 2
        if prepared.n_segments == 0:
            self.ranges = np.zeros(n_rays, np.float32)
            self.unobserved_volumes = np.zeros(n_rays)
            self.terminal_states = np.full(n_rays, OccupancyType.NULL, np.int32)
            self.intersected_voxels = np.zeros((n_rays, 3), np.int32)
            return True
        # Queries must see existing regions but must not create new ones:
        # allocate only regions already present in the host map.
        present = np.array([k for k in map(tuple, prepared.region_keys)
                            if m.region(k) is not None], dtype=np.int32).reshape(-1, 3)
        if len(present):
            mapper.arena.ensure_regions(present, host_map=m)
        fill_corner_slots(prepared, mapper.arena.table)

        batch = {k: jnp.asarray(v) for k, v in prepared.arrays.items()}
        cfg = mapper._config(0)
        fn = _device_fn_cache.get(cfg)
        if fn is None:
            fn = jax.jit(_rays_query_device, static_argnames=("cfg",))
            _device_fn_cache[cfg] = fn
        vol, occ_found, range_local, terminal, term_vox = [
            np.asarray(x) for x in fn(mapper.arena.device_state(), batch, cfg)]

        # Host stitch: combine per-segment partials per ray (segments are
        # contiguous and ordered in the prepared batch).
        total = prepared.n_segments
        ints = prepared.arrays["ints"][:total]
        floats = prepared.arrays["floats"][:total]
        flags = prepared.arrays["flags"][:total]
        t0 = floats[:, 10]
        is_first = flags[:, 2]
        ray_of = np.cumsum(is_first.astype(np.int64)) - 1

        # Note: filtered-out rays produce no segments; map stitched results
        # back through the per-ray filter acceptance.
        if m.ray_filter is not None and n_rays:
            _, _, _, accept = m.ray_filter(self.rays[0::2], self.rays[1::2])
        else:
            accept = np.ones(n_rays, dtype=bool)
        out_idx = np.flatnonzero(accept)

        ranges = np.zeros(n_rays, np.float32)
        volumes = np.zeros(n_rays)
        states = np.full(n_rays, OccupancyType.NULL, np.int32)
        voxels = np.zeros((n_rays, 3), np.int32)

        n_stitched = int(ray_of[-1]) + 1 if total else 0
        for r in range(n_stitched):
            sel = np.flatnonzero(ray_of == r)
            ray_slot = out_idx[r]
            v = 0.0
            rng = 0.0
            st = OccupancyType.NULL
            tv = np.zeros(3, np.int32)
            for s in sel:
                v += vol[s]
                st = terminal[s]
                tv = term_vox[s]
                if occ_found[s]:
                    rng = t0[s] + range_local[s]
                    break
                rng = t0[s] + range_local[s]
            ranges[ray_slot] = rng
            volumes[ray_slot] = v * self.volume_coefficient
            states[ray_slot] = st
            voxels[ray_slot] = tv

        self.ranges = ranges
        self.unobserved_volumes = volumes
        self.terminal_states = states
        self.intersected_voxels = voxels
        return True

    def terminal_keys(self):
        """Terminal voxels as (region, local) keys."""
        return keymath.abs_to_key(self.intersected_voxels, self.map.region_voxel_dims)
