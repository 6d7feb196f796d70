"""Host-side occupancy map: parameters + sparse region (chunk) store.

Reference parity: ohm/OccupancyMap.{h,cpp}, ohm/MapChunk.h, ohm/MapRegion.h,
ohm/MapInfo.h, ohm/MapFlag.h.  This object is the CPU-resident source of
truth: chunks are dense per-layer numpy arrays keyed by region coordinate.
The TPU mapper (ohm_tpu.mapping) pages regions between this store and the
device HBM arena, playing the role of the reference's GpuLayerCache.
"""

from __future__ import annotations

from enum import IntFlag
from typing import Callable, Iterator, Optional

import numpy as np

from ohm_tpu.core import keys as keymath
from ohm_tpu.core.layout import MapLayout, default_layout, OCCUPANCY_LAYER
from ohm_tpu.core.probability import probability_to_value, unobserved_occupancy_value
from ohm_tpu.core.filters import good_ray_filter

DEFAULT_REGION_DIM = 32  # reference default chunk dim (docs/docusage.md:36-41)


class MapFlag(IntFlag):
    """Map construction flags (reference: ohm/MapFlag.h:16-37)."""

    NONE = 0
    VOXEL_MEAN = 1 << 0
    COMPRESSED = 1 << 1
    TRAVERSAL = 1 << 2
    TOUCH_TIME = 1 << 3
    INCIDENT_NORMAL = 1 << 4
    TSDF = 1 << 5
    SECONDARY_SAMPLE = 1 << 6
    DEFAULT = COMPRESSED


class MapChunk:
    """Dense voxel storage for one region (reference: ohm/MapChunk.h:33-56).

    ``layers[i]`` is a structured numpy array of shape (layer_volume,) whose
    byte layout matches the reference voxel struct (see VoxelLayout).
    """

    __slots__ = ("region_key", "centre", "touched_time", "dirty_stamp", "touched_stamps", "layers")

    def __init__(self, region_key, centre, layout: MapLayout, region_voxel_dims):
        self.region_key = tuple(int(v) for v in region_key)
        self.centre = np.asarray(centre, dtype=np.float64)
        self.touched_time = 0.0
        self.dirty_stamp = 0
        self.touched_stamps = np.zeros(len(layout), dtype=np.uint64)
        self.layers: list[np.ndarray] = []
        for layer in layout:
            volume = layer.volume(region_voxel_dims)
            arr = np.empty(volume, dtype=layer.voxel_layout.numpy_dtype())
            arr[:] = layer.voxel_layout.clear_record()
            self.layers.append(arr)

    def first_valid_index(self, occupancy_layer: int) -> int:
        """Index of the first non-unobserved occupancy voxel, or volume if none."""
        occ = self.layers[occupancy_layer][OCCUPANCY_LAYER]
        valid = np.flatnonzero(occ != np.float32(np.inf))
        return int(valid[0]) if valid.size else occ.size

    def overlaps_extents(self, min_ext, max_ext, region_spatial) -> bool:
        half = 0.5 * np.asarray(region_spatial)
        lo = self.centre - half
        hi = self.centre + half
        return bool(np.all(lo <= max_ext) and np.all(min_ext <= hi))


class OccupancyMap:
    """The map object (reference: ohm/OccupancyMap.h:114).

    Holds quantisation geometry, probability model parameters and the sparse
    chunk store.  All coordinate transforms run in float64.
    """

    def __init__(
        self,
        resolution: float = 1.0,
        region_voxel_dims=(DEFAULT_REGION_DIM,) * 3,
        flags: MapFlag = MapFlag.DEFAULT,
        layout: Optional[MapLayout] = None,
        origin=(0.0, 0.0, 0.0),
    ):
        if np.isscalar(region_voxel_dims):
            region_voxel_dims = (region_voxel_dims,) * 3
        self.resolution = float(resolution)
        self.region_voxel_dims = np.array(
            [d if d > 0 else DEFAULT_REGION_DIM for d in region_voxel_dims], dtype=np.int32
        )
        self.region_spatial_dims = self.region_voxel_dims.astype(np.float64) * self.resolution
        self.origin = np.asarray(origin, dtype=np.float64)
        self.flags = MapFlag(flags)
        self.stamp = 0
        self.first_ray_time = -1.0
        self.info: dict[str, object] = {}  # MapInfo (reference: ohm/MapInfo.h)

        # Probability model defaults (reference: ohm/OccupancyMap.cpp:207-213).
        self.min_voxel_value = -2.0
        self.max_voxel_value = 3.511
        self.saturate_at_min_value = False
        self.saturate_at_max_value = False
        self.set_hit_probability(0.9)
        self.set_miss_probability(0.45)
        self.set_occupancy_threshold_probability(0.5)

        # Default ray filter rejects non-finite and absurdly long rays
        # (reference: ohm/OccupancyMap.cpp:215-218).
        self.ray_filter: Optional[Callable] = lambda starts, ends: good_ray_filter(starts, ends, 1e10)

        self.layout = layout if layout is not None else default_layout()
        if self.layout.layer_index(OCCUPANCY_LAYER) < 0:
            self.layout.add_occupancy()
        if self.flags & MapFlag.VOXEL_MEAN:
            self.layout.add_mean()
        if self.flags & MapFlag.TRAVERSAL:
            self.layout.add_traversal()
        if self.flags & MapFlag.TOUCH_TIME:
            self.layout.add_touch_time()
        if self.flags & MapFlag.INCIDENT_NORMAL:
            self.layout.add_incident_normal()
        if self.flags & MapFlag.TSDF:
            self.layout.add_tsdf()
        if self.flags & MapFlag.SECONDARY_SAMPLE:
            self.layout.add_secondary_samples()

        self.chunks: dict[tuple[int, int, int], MapChunk] = {}

    # ------------------------------------------------------------------ #
    # Probability model

    def set_hit_probability(self, probability: float):
        self.hit_value = float(np.float32(probability_to_value(np.float32(probability))))

    def set_miss_probability(self, probability: float):
        self.miss_value = float(np.float32(probability_to_value(np.float32(probability))))

    def set_occupancy_threshold_probability(self, probability: float):
        self.occupancy_threshold_value = float(np.float32(probability_to_value(np.float32(probability))))

    @property
    def saturation_min(self) -> float:
        return self.min_voxel_value if self.saturate_at_min_value else float(np.finfo(np.float32).min)

    @property
    def saturation_max(self) -> float:
        return self.max_voxel_value if self.saturate_at_max_value else float(np.finfo(np.float32).max)

    # ------------------------------------------------------------------ #
    # Coordinate transforms

    def voxel_key(self, points):
        """Global point(s) -> (region int32 (...,3), local int32 (...,3))."""
        return keymath.voxel_key(points, self.origin, self.region_spatial_dims, self.region_voxel_dims,
                                 self.resolution)

    def voxel_centre_global(self, region, local):
        return keymath.voxel_centre(region, local, self.origin, self.region_spatial_dims, self.resolution)

    def voxel_index(self, local):
        return keymath.voxel_index(local, self.region_voxel_dims)

    def region_centre_global(self, region_key):
        return self.origin + np.asarray(region_key, dtype=np.float64) * self.region_spatial_dims

    def region_spatial_min(self, region_key):
        return self.region_centre_global(region_key) - 0.5 * self.region_spatial_dims

    # ------------------------------------------------------------------ #
    # Chunk store

    def region(self, region_key, allow_create: bool = False) -> Optional[MapChunk]:
        key = tuple(int(v) for v in np.asarray(region_key).reshape(3))
        chunk = self.chunks.get(key)
        if chunk is None and allow_create:
            centre = self.region_centre_global(key)
            chunk = MapChunk(key, centre, self.layout, self.region_voxel_dims)
            self.chunks[key] = chunk
        return chunk

    def region_count(self) -> int:
        return len(self.chunks)

    def __iter__(self) -> Iterator[MapChunk]:
        return iter(self.chunks.values())

    def touch(self) -> int:
        """Advance and return the map stamp (reference: OccupancyMap::touch)."""
        self.stamp += 1
        return self.stamp

    def update_first_ray_time(self, timestamp: float):
        if self.first_ray_time < 0:
            self.first_ray_time = float(timestamp)

    def clear(self):
        self.chunks.clear()
        self.stamp = 0
        self.first_ray_time = -1.0

    def clone(self) -> "OccupancyMap":
        import copy

        other = OccupancyMap(self.resolution, tuple(self.region_voxel_dims), self.flags,
                             layout=copy.deepcopy(self.layout), origin=self.origin.copy())
        other.hit_value = self.hit_value
        other.miss_value = self.miss_value
        other.occupancy_threshold_value = self.occupancy_threshold_value
        other.min_voxel_value = self.min_voxel_value
        other.max_voxel_value = self.max_voxel_value
        other.saturate_at_min_value = self.saturate_at_min_value
        other.saturate_at_max_value = self.saturate_at_max_value
        other.stamp = self.stamp
        other.first_ray_time = self.first_ray_time
        other.info = dict(self.info)
        for key, chunk in self.chunks.items():
            clone_chunk = MapChunk(key, chunk.centre, other.layout, other.region_voxel_dims)
            clone_chunk.touched_time = chunk.touched_time
            clone_chunk.dirty_stamp = chunk.dirty_stamp
            clone_chunk.touched_stamps = chunk.touched_stamps.copy()
            clone_chunk.layers = [arr.copy() for arr in chunk.layers]
            other.chunks[key] = clone_chunk
        return other

    # ------------------------------------------------------------------ #
    # Voxel access helpers (test / query convenience)

    def layer_index(self, name: str) -> int:
        return self.layout.layer_index(name)

    def ensure_chunk_layers(self):
        """Backfill layer arrays on existing chunks after layout growth.

        The reference allocates VoxelBlocks per layer at chunk construction;
        adding a layer later (e.g. enabling clearance or NDT on a populated
        map) must extend existing chunks (reference: updateLayout semantics).
        """
        n_layers = len(self.layout)
        for chunk in self.chunks.values():
            while len(chunk.layers) < n_layers:
                layer = self.layout.layers[len(chunk.layers)]
                volume = layer.volume(self.region_voxel_dims)
                arr = np.empty(volume, dtype=layer.voxel_layout.numpy_dtype())
                arr[:] = layer.voxel_layout.clear_record()
                chunk.layers.append(arr)
            if len(chunk.touched_stamps) < n_layers:
                stamps = np.zeros(n_layers, dtype=np.uint64)
                stamps[: len(chunk.touched_stamps)] = chunk.touched_stamps
                chunk.touched_stamps = stamps

    def voxel_value(self, point=None, key=None) -> float:
        """Occupancy value at a point or (region, local) key; +inf if unobserved/absent."""
        if key is None:
            region, local = self.voxel_key(np.asarray(point, dtype=np.float64))
        else:
            region, local = key
        chunk = self.region(region)
        if chunk is None:
            return unobserved_occupancy_value()
        idx = int(self.voxel_index(np.asarray(local)))
        layer_idx = self.layer_index(OCCUPANCY_LAYER)
        return float(chunk.layers[layer_idx][OCCUPANCY_LAYER][idx])

    def occupancy_type(self, value: float) -> str:
        """Classify a voxel value: 'null' | 'unobserved' | 'free' | 'occupied'."""
        if value == unobserved_occupancy_value():
            return "unobserved"
        if value >= self.occupancy_threshold_value:
            return "occupied"
        return "free"

    def calculate_extents(self):
        """Min/max global coordinates covered by allocated regions.

        Reference parity: OccupancyMap::calculateExtents.
        Returns (min, max) or None when the map is empty.
        """
        if not self.chunks:
            return None
        region_keys = np.array(list(self.chunks.keys()), dtype=np.float64)
        centres = self.origin + region_keys * self.region_spatial_dims
        half = 0.5 * self.region_spatial_dims
        return centres.min(axis=0) - half, centres.max(axis=0) + half

    # ------------------------------------------------------------------ #
    # Region lifecycle (reference: OccupancyMap expiry/culling API)

    def expire_regions_by_time(self, before_time: float) -> int:
        doomed = [k for k, c in self.chunks.items() if c.touched_time < before_time]
        for k in doomed:
            del self.chunks[k]
        return len(doomed)

    def expire_regions_by_distance(self, from_point, distance: float) -> int:
        from_point = np.asarray(from_point, dtype=np.float64)
        doomed = []
        for k, c in self.chunks.items():
            half = 0.5 * self.region_spatial_dims
            nearest = np.clip(from_point, c.centre - half, c.centre + half)
            if np.linalg.norm(nearest - from_point) > distance:
                doomed.append(k)
        for k in doomed:
            del self.chunks[k]
        return len(doomed)

    def cull_regions_outside(self, min_ext, max_ext) -> int:
        min_ext = np.asarray(min_ext, dtype=np.float64)
        max_ext = np.asarray(max_ext, dtype=np.float64)
        doomed = [k for k, c in self.chunks.items()
                  if not c.overlaps_extents(min_ext, max_ext, self.region_spatial_dims)]
        for k in doomed:
            del self.chunks[k]
        return len(doomed)

    # ------------------------------------------------------------------ #

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        """Convenience occupancy integration via the CPU oracle mapper.

        Reference parity: OccupancyMap::integrateRays delegating to
        RayMapperOccupancy.  ``rays`` is (2*N, 3) origin/sample interleaved
        (reference convention) or (N, 2, 3).
        """
        from ohm_tpu.oracle.occupancy import RayMapperOccupancy

        return RayMapperOccupancy(self).integrate_rays(rays, intensities, timestamps, ray_update_flags)
