"""TpuNdtMap: NDT-OM / NDT-TM ray integration on TPU (reference: GpuNdtMap).

Extends the occupancy mapper with covariance, and for traversability mode
(NDT-TM) intensity + hit/miss-count layers (reference: ohmgpu/GpuNdtMap.cpp,
ohm/NdtMap.h).  Parameter defaults mirror ohm/private/NdtMapDetail.h.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ohm_tpu.core.layout import (
    TRAVERSAL_LAYER,
    TOUCH_TIME_LAYER,
    INCIDENT_NORMAL_LAYER,
)
from ohm_tpu.core.probability import value_to_probability
from ohm_tpu.mapping.arena import VoxelArena
from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots, max_steps_for
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops.integrate_ndt import NdtConfig, integrate_ndt_jit
from ohm_tpu.oracle.ndt import NdtParams, ndt_adaptation_rate_from_miss_probability


class TpuNdtMap(TpuRayMapper):
    """NDT integrator; ``params.ndt_tm`` selects traversability mode."""

    def __init__(self, map_obj, params: NdtParams | None = None, capacity: int = 1024,
                 segment_length: float | None = None, validate: bool = False,
                 miss_k: int | str = 1 << 16):
        self.params = params or NdtParams()
        if self.params.adaptation_rate <= 0:
            miss_p = float(value_to_probability(map_obj.miss_value))
            self.params.adaptation_rate = ndt_adaptation_rate_from_miss_probability(miss_p)
        # NDT requires occupancy + mean + covariance (+ intensity/hit-miss for TM).
        map_obj.layout.add_occupancy()
        map_obj.layout.add_mean()
        map_obj.layout.add_covariance()
        if self.params.ndt_tm:
            map_obj.layout.add_intensity()
            map_obj.layout.add_hit_miss_count()
        #: Auto-sized NDT miss-phase stream width: every K-stream cost
        #: (arena gathers, the NDT math, the aggregation sort) scales with
        #: the static K, while the actual Gaussian-flagged record count is
        #: scene-dependent and usually far below the 65536 default.  Sized
        #: once from the 'ndt_flagged' stat (4th batch, 2x headroom, pow2,
        #: then monotone up); overflow surfaces in stats and escalates —
        #: the overflowing batch's beyond-K flagged records degrade to
        #: standard misses (counted, logged).  ``miss_k="exact"`` pins K to
        #: the full record stream so NO record can ever degrade — exact
        #: reference semantics (the reference GPU kernel has no window,
        #: ohmgpu/gpu/CovarianceHit.cl processes every flagged record) at a
        #: K-stream cost that scales with the whole stream.
        if miss_k == "exact":
            self.miss_k = 1 << 30  # K = min(miss_k, stream) == stream
            self._auto_miss_k = False
            self._miss_k_sized = True
        else:
            self.miss_k = int(miss_k)
            self._auto_miss_k = miss_k == 1 << 16
            self._miss_k_sized = False
        #: Rayflow wire ships the per-ray intensity block (NDT-TM samples).
        self._rayflow_intensity = True

        super().__init__(map_obj, capacity=capacity, segment_length=segment_length, validate=validate)

        layer_names = list(self.arena.layer_names)
        extra = ["cov"]
        if self.params.ndt_tm:
            extra += ["intensity", "hit_count", "miss_count"]
        for name in extra:
            if name not in layer_names:
                layer_names.append(name)
        self.arena = VoxelArena(self.arena.capacity, self.region_shift, layer_names,
                                scatter_pad=self.arena.scatter_pad)

    def _ndt_config(self, ray_flags: int, group_cap: int = 0,
                    base=None, n_segments: int = 0) -> NdtConfig:
        p = self.params
        base = base if base is not None else self._config(ray_flags, group_cap=group_cap)
        # Fused two-level std-count deposit (integrate_ndt fused branch);
        # eligibility lives in ONE place — TpuRayMapper._fused_row_cap_for.
        rc = self._fused_row_cap_for(n_segments, base.group_cap)
        if rc:
            import dataclasses as _dc
            base = _dc.replace(base, row_cap=rc)
        return NdtConfig(
            base=base,
            sensor_noise=float(p.sensor_noise),
            sample_threshold=int(p.sample_threshold),
            adaptation_rate=float(p.adaptation_rate),
            reinit_threshold=float(np.float32(p.reinitialise_covariance_threshold)),
            reinit_count=int(p.reinitialise_covariance_point_count),
            initial_intensity_covariance=float(p.initial_intensity_covariance),
            ndt_tm=bool(p.ndt_tm),
            miss_k=self.miss_k,
        )

    def _auto_size_miss_k(self, stats) -> None:
        """One-time shrink of the miss-phase K from the batch's flagged
        count (2x headroom, pow2, floor 4096); ndt_overflow afterwards
        escalates (doubles) it — overflowed records degrade to standard
        misses, counted in stats['ndt_overflow']."""
        if not self._auto_miss_k or self._miss_k_sized:
            return  # overflow escalation happens at drain time (no readback)
        if self._stats["batches"] < 3:
            return
        flagged = int(stats.get("ndt_flagged", -1))
        if flagged < 0:
            return
        k = 4096
        while k < 2 * flagged:
            k *= 2
        self.miss_k = min(self.miss_k, k)
        self._miss_k_sized = True

    def _dispatch_rayflow(self, batch, base_cfg, n_rays, ray_update_flags) -> int:
        cfg = self._ndt_config(ray_update_flags, base=base_cfg, n_segments=n_rays)
        new_state, stats = integrate_ndt_jit(self.arena.device_state(), batch, cfg)
        self.arena.update_state(new_state)
        self._auto_size_row_cap(stats, n_rays)
        self._auto_size_miss_k(stats)
        self._stats["rays"] += n_rays
        self._stats["segments"] += n_rays
        self._stats["batches"] += 1
        self._pending_stats.append({k: v for k, v in stats.items()
                                    if k in ("missed_updates", "overflow",
                                             "compaction_dropped", "dropped_updates",
                                             "ndt_overflow")})
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0, "device slot resolution missed"
            assert self._stats["overflow"] == 0, "DDA step cap exceeded"
            assert self._stats["compaction_dropped"] == 0
            assert self._stats["dropped_updates"] == 0, \
                "fused row_cap exceeded — deposit dropped voxel-lasts"
        return n_rays

    def _integrate_batch(self, rays, intensities=None, timestamps=None, ray_update_flags: int = 0) -> int:
        m = self.map
        m.touch()
        if self.rayflow:
            setup = self._rayflow_setup(rays, timestamps, intensities, ray_update_flags)
            if setup is not None:
                batch, base_cfg, n_rays = setup
                return self._dispatch_rayflow(batch, base_cfg, n_rays, ray_update_flags)
        prepared = prepare_ray_batch(
            m, rays, timestamps=timestamps, intensities=intensities,
            ray_update_flags=ray_update_flags, segment_length=self.segment_length,
        )
        n_rays = np.asarray(rays).reshape(-1, 3).shape[0] // 2
        if prepared.n_segments == 0:
            return n_rays

        self.arena.ensure_regions(prepared.region_keys, host_map=m)
        fill_corner_slots(prepared, self.arena.table)

        dims0 = int(self.map.region_voxel_dims[0])
        if dims0 <= 32 and self.arena.capacity < 32767:
            from ohm_tpu.mapping.batch import build_wire
            batch = {"wire": jnp.asarray(build_wire(
                prepared, dims0, with_mean=True, with_tsdf=False,
                with_touch=self.with_touch))}
        else:
            batch = {k: jnp.asarray(v) for k, v in prepared.arrays.items()}
        batch["intensity"] = jnp.asarray(
            prepared.intensities if prepared.intensities is not None
            else np.zeros(prepared.size, dtype=np.float32))
        cfg = self._ndt_config(ray_update_flags, group_cap=self._group_cap(prepared),
                               n_segments=prepared.n_segments)
        state = self.arena.device_state()
        new_state, stats = integrate_ndt_jit(state, batch, cfg)
        self.arena.update_state(new_state)
        self._auto_size_row_cap(stats, prepared.n_segments)
        self._auto_size_miss_k(stats)

        self._stats["rays"] += n_rays
        self._stats["segments"] += prepared.n_segments
        self._stats["batches"] += 1
        self._pending_stats.append({k: v for k, v in stats.items()
                                    if k in ("missed_updates", "overflow",
                                             "compaction_dropped", "dropped_updates",
                                             "ndt_overflow")})
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0, "device slot resolution missed"
            assert self._stats["overflow"] == 0, "DDA step cap exceeded"
            assert self._stats["compaction_dropped"] == 0, \
                "group compaction dropped live records — host group_cap bug"
            assert self._stats["dropped_updates"] == 0, \
                "fused row_cap exceeded — deposit dropped voxel-lasts"
        return n_rays
