"""Structured debug tracing (reference: ohm/Trace + RayMapperTrace + 3es).

The reference streams visual debug events to 3rd Eye Scene; without a 3es
viewer in this stack, Trace writes structured JSONL events (rays, voxel
snapshots, map stats) that tooling can replay or plot.  RayMapperTrace-style
decoration is provided by ``TracingRayMapper``.
"""

from __future__ import annotations

import json
import time

import numpy as np


class Trace:
    """Event stream writer (reference API: ohm/Trace.h:37-66)."""

    def __init__(self, filename: str):
        self.filename = filename
        self._f = open(filename, "w")
        self.event("trace_begin", time=time.time())

    def event(self, kind: str, **payload):
        def clean(v):
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, (np.floating, np.integer)):
                return v.item()
            return v

        self._f.write(json.dumps({"event": kind, **{k: clean(v) for k, v in payload.items()}}) + "\n")

    def close(self):
        if self._f:
            self.event("trace_end", time=time.time())
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TracingRayMapper:
    """Decorates a ray mapper with per-batch trace events
    (reference: ohm/RayMapperTrace.h:38-80)."""

    def __init__(self, mapper, trace: Trace, sample_limit: int = 64):
        self.mapper = mapper
        self.trace = trace
        self.sample_limit = sample_limit
        self.map = mapper.map

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n = self.mapper.integrate_rays(rays, intensities=intensities, timestamps=timestamps,
                                       ray_update_flags=ray_update_flags)
        self.trace.event(
            "integrate_rays",
            count=int(rays.shape[0] // 2),
            flags=int(ray_update_flags),
            rays=rays[: 2 * self.sample_limit],
            regions=self.map.region_count(),
            stamp=self.map.stamp,
        )
        return n

    def __getattr__(self, name):
        return getattr(self.mapper, name)


class RayMapperTrace(TracingRayMapper):
    """Full per-ray/voxel/ellipsoid trace decorator
    (reference: ohm/RayMapperTrace.{h,cpp}).

    Wraps any mapper; each integrate_rays snapshots the occupancy state of
    every voxel the batch touches (walked on the host, as the reference's
    cacheState does), integrates through the wrapped mapper, re-snapshots,
    and emits the rays plus only the voxels whose OccupancyType CHANGED —
    including NDT ellipsoid pose/scale from the covariance layer when
    present (reference VoxelState ellipse_{rotation,pos,scale}).  The 3es
    stream is replaced by Trace's JSONL events.
    """

    def __init__(self, mapper, trace: Trace, sample_limit: int = 64):
        super().__init__(mapper, trace, sample_limit)

    # -- state snapshots ---------------------------------------------------

    def _touched_keys(self, rays):
        from ohm_tpu.oracle.linewalk import walk_segment_keys
        from ohm_tpu.core import keys as keymath

        abs_keys = set()

        def visit(abs_key, marker, enter, exit_):
            abs_keys.add(tuple(int(v) for v in abs_key))
            return True

        for i in range(0, len(rays), 2):
            walk_segment_keys(self.map, rays[i], rays[i + 1], visit)

        keys = set()
        dims = self.map.region_voxel_dims
        if abs_keys:
            arr = np.array(sorted(abs_keys), np.int64)
            region, local = keymath.abs_to_key(arr, dims)
            for j in range(len(arr)):
                keys.add((tuple(int(v) for v in region[j]), tuple(int(v) for v in local[j])))
        for i in range(1, len(rays), 2):
            region, local = self.map.voxel_key(rays[i])
            keys.add((tuple(int(v) for v in np.asarray(region).reshape(3)),
                      tuple(int(v) for v in np.asarray(local).reshape(3))))
        return keys

    def _snapshot(self, keys):
        from ohm_tpu.core.layout import OCCUPANCY_LAYER, COVARIANCE_LAYER, MEAN_LAYER
        from ohm_tpu.core.subvoxel import sub_voxel_to_local_coord

        occ_idx = self.map.layer_index(OCCUPANCY_LAYER)
        cov_idx = self.map.layer_index(COVARIANCE_LAYER)
        mean_idx = self.map.layer_index(MEAN_LAYER)
        states = {}
        for region, local in keys:
            chunk = self.map.region(region)
            if chunk is None:
                states[(region, local)] = ("null", None)
                continue
            idx = int(self.map.voxel_index(np.asarray(local)))
            value = float(chunk.layers[occ_idx][OCCUPANCY_LAYER][idx])
            kind = self.map.occupancy_type(value)
            ellipse = None
            if cov_idx >= 0 and kind == "occupied":
                cov6 = np.array([chunk.layers[cov_idx][n][idx]
                                 for n in ("P00", "P01", "P11", "P02", "P12", "P22")], np.float64)
                s = np.zeros((3, 3))
                s[0, 0], s[1, 0], s[1, 1], s[2, 0], s[2, 1], s[2, 2] = cov6
                p = s @ s.T
                w, v = np.linalg.eigh(p)
                scale = np.sqrt(np.maximum(w, 0.0))
                centre = self.map.voxel_centre_global(
                    np.asarray(region, np.int32), np.asarray(local, np.int32)).reshape(3)
                if mean_idx >= 0:
                    coord = chunk.layers[mean_idx]["coord"][idx]
                    centre = centre + sub_voxel_to_local_coord(
                        np.asarray([coord], np.uint32), self.map.resolution)[0]
                ellipse = {"pos": centre.tolist(), "scale": scale.tolist(),
                           "axes": v.tolist()}
            states[(region, local)] = (kind, ellipse)
        return states

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        keys = self._touched_keys(rays)
        before = self._snapshot(keys)
        n = self.mapper.integrate_rays(rays, intensities=intensities, timestamps=timestamps,
                                       ray_update_flags=ray_update_flags)
        if hasattr(self.mapper, "sync_voxels"):
            self.mapper.sync_voxels()
        after = self._snapshot(keys)

        changes = []
        ellipsoids = []
        for key in keys:
            old_kind = before[key][0]
            new_kind, new_ellipse = after[key]
            if old_kind != new_kind:
                changes.append({"region": list(key[0]), "local": list(key[1]),
                                "from": old_kind, "to": new_kind})
            if new_ellipse is not None:
                ellipsoids.append({"region": list(key[0]), "local": list(key[1]),
                                   **new_ellipse})
        self.trace.event(
            "integrate_rays",
            count=int(rays.shape[0] // 2),
            flags=int(ray_update_flags),
            rays=rays[: 2 * self.sample_limit],
            voxel_changes=changes,
            ellipsoids=ellipsoids[: self.sample_limit],
            regions=self.map.region_count(),
            stamp=self.map.stamp,
        )
        return n


def debug_draw(map_obj, trace: Trace, max_voxels: int = 200000):
    """Whole-map snapshot event (reference: ohm/DebugDraw.h:17-32
    debugDraw* send complete occupied/free/NDT-ellipsoid sets to 3es).

    Emits one 'debug_draw' event with every observed voxel's centre, type
    and value, plus NDT ellipsoids (pos/scale/axes) when a covariance layer
    is present.  ``max_voxels`` bounds the payload; the count of omitted
    voxels is reported so truncation is never silent.
    """
    from ohm_tpu.core.layout import OCCUPANCY_LAYER, COVARIANCE_LAYER, MEAN_LAYER
    from ohm_tpu.core import keys as keymath
    from ohm_tpu.core.subvoxel import sub_voxel_to_local_coord

    occ_idx = map_obj.layer_index(OCCUPANCY_LAYER)
    cov_idx = map_obj.layer_index(COVARIANCE_LAYER)
    mean_idx = map_obj.layer_index(MEAN_LAYER)
    dims = map_obj.region_voxel_dims
    centres, values, kinds = [], [], []
    ellipsoids = []
    omitted = 0
    for key, chunk in map_obj.chunks.items():
        occ = chunk.layers[occ_idx][OCCUPANCY_LAYER]
        sel = np.flatnonzero(np.isfinite(occ))
        if not sel.size:
            continue
        if len(values) and len(values[0]) * len(values) > max_voxels:
            omitted += sel.size
            continue
        local = keymath.local_key_from_index(sel, dims)
        region = np.broadcast_to(np.asarray(key, np.int32), (len(sel), 3))
        c = map_obj.voxel_centre_global(region, local)
        centres.append(c)
        values.append(occ[sel])
        kinds.append(occ[sel] >= map_obj.occupancy_threshold_value)
        if cov_idx >= 0:
            occupied = np.flatnonzero(occ[sel] >= map_obj.occupancy_threshold_value)
            for j in occupied[:256]:
                idx = int(sel[j])
                cov6 = np.array([chunk.layers[cov_idx][n][idx]
                                 for n in ("P00", "P01", "P11", "P02", "P12", "P22")],
                                np.float64)
                s = np.zeros((3, 3))
                s[0, 0], s[1, 0], s[1, 1], s[2, 0], s[2, 1], s[2, 2] = cov6
                p = s @ s.T
                w, v = np.linalg.eigh(p)
                centre = c[j].copy()
                if mean_idx >= 0:
                    coord = chunk.layers[mean_idx]["coord"][idx]
                    centre = centre + sub_voxel_to_local_coord(
                        np.asarray([coord], np.uint32), map_obj.resolution)[0]
                ellipsoids.append({"pos": centre.tolist(),
                                   "scale": np.sqrt(np.maximum(w, 0)).tolist(),
                                   "axes": v.tolist()})
    if centres:
        centres = np.concatenate(centres)
        values = np.concatenate(values)
        kinds = np.concatenate(kinds)
    trace.event(
        "debug_draw",
        voxel_count=int(len(values)) if len(centres) else 0,
        omitted=omitted,
        centres=centres[:max_voxels] if len(centres) else [],
        values=values[:max_voxels] if len(centres) else [],
        occupied=kinds[:max_voxels] if len(centres) else [],
        ellipsoids=ellipsoids,
        stamp=map_obj.stamp,
    )
