"""TpuTsdfMap: truncated signed distance field integration on TPU.

Reference analogue: ohmgpu/GpuTsdfMap.cpp + ohm/RayMapperTsdf.cpp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ohm_tpu.core.layout import TSDF_LAYER
from ohm_tpu.mapping.arena import VoxelArena
from ohm_tpu.mapping.batch import prepare_ray_batch, fill_corner_slots
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops.integrate_tsdf import TsdfConfig, integrate_tsdf_jit
from ohm_tpu.oracle.tsdf import TsdfOptions


class TpuTsdfMap(TpuRayMapper):
    """TSDF integrator (tsdf layer only; ray_update_flags ignored as in the
    reference RayMapperTsdf)."""

    def __init__(self, map_obj, options: TsdfOptions | None = None, capacity: int = 1024,
                 segment_length: float | None = None, validate: bool = False,
                 scatter_cap: int | str = "auto"):
        self.options = options or TsdfOptions()
        map_obj.layout.add_tsdf()
        super().__init__(map_obj, capacity=capacity, segment_length=segment_length,
                         validate=validate, scatter_cap=scatter_cap)
        layer_names = ["occupancy", "tsdf_weight", "tsdf_distance"]
        self.arena = VoxelArena(self.arena.capacity, self.region_shift, layer_names,
                                scatter_pad=self.arena.scatter_pad)

    def _tsdf_config(self, group_cap: int = 0) -> TsdfConfig:
        import dataclasses
        o = self.options
        return TsdfConfig(
            base=dataclasses.replace(self._config(0, group_cap=group_cap),
                                     wire_tsdf=True),
            max_weight=float(o.max_weight),
            default_truncation_distance=float(o.default_truncation_distance),
            dropoff_epsilon=float(o.dropoff_epsilon),
            sparsity_compensation_factor=float(o.sparsity_compensation_factor),
            per_visit=bool(o.per_visit),
        )

    def _dispatch_rayflow(self, batch, base_cfg, n_rays, ray_update_flags) -> int:
        cfg = TsdfConfig(
            base=base_cfg,
            max_weight=float(self.options.max_weight),
            default_truncation_distance=float(self.options.default_truncation_distance),
            dropoff_epsilon=float(self.options.dropoff_epsilon),
            sparsity_compensation_factor=float(self.options.sparsity_compensation_factor),
            per_visit=bool(self.options.per_visit),
        )
        new_state, stats = integrate_tsdf_jit(self.arena.device_state(), batch, cfg)
        self.arena.update_state(new_state)
        self._auto_size_scatter_cap(stats, n_rays)
        self._stats["rays"] += n_rays
        self._stats["segments"] += n_rays
        self._stats["batches"] += 1
        self._pending_stats.append(stats)
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0
            assert self._stats["overflow"] == 0
            assert self._stats["compaction_dropped"] == 0
            assert self._stats["dropped_updates"] == 0
        return n_rays

    def _integrate_batch(self, rays, intensities=None, timestamps=None, ray_update_flags: int = 0) -> int:
        m = self.map
        m.touch()
        if self.rayflow:
            setup = self._rayflow_setup(rays, timestamps, None, ray_update_flags)
            if setup is not None:
                batch, base_cfg, n_rays = setup
                return self._dispatch_rayflow(batch, base_cfg, n_rays, ray_update_flags)
        prepared = prepare_ray_batch(m, rays, timestamps=timestamps,
                                     segment_length=self.segment_length)
        n_rays = np.asarray(rays).reshape(-1, 3).shape[0] // 2
        if prepared.n_segments == 0:
            return n_rays
        self.arena.ensure_regions(prepared.region_keys, host_map=m)
        fill_corner_slots(prepared, self.arena.table)
        dims0 = int(self.map.region_voxel_dims[0])
        if dims0 <= 32 and self.arena.capacity < 32767:
            from ohm_tpu.mapping.batch import build_wire
            batch = {"wire": jnp.asarray(build_wire(
                prepared, dims0, with_mean=False, with_tsdf=True,
                with_touch=self.with_touch))}
        else:
            batch = {k: jnp.asarray(v) for k, v in prepared.arrays.items()}
        cfg = self._tsdf_config(group_cap=self._group_cap(prepared))
        new_state, stats = integrate_tsdf_jit(self.arena.device_state(), batch, cfg)
        self.arena.update_state(new_state)
        self._auto_size_scatter_cap(stats, n_rays)
        self._stats["rays"] += n_rays
        self._stats["segments"] += prepared.n_segments
        self._stats["batches"] += 1
        self._pending_stats.append(stats)
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0
            assert self._stats["overflow"] == 0
            assert self._stats["compaction_dropped"] == 0
        return n_rays
