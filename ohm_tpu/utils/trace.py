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
