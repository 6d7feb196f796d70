"""MapHarness: the shared application skeleton.

Reference parity: ohmapp/MapHarness.h:50-303, ohmapp/DataSource.h,
ohmapp/SlamIOSource.cpp, ohmapp/OhmAppCpu.cpp, ohmapp/OhmAppGpu.cpp —
options -> prepare -> batched run with progress -> finalise -> save stats
and .ohm/.ply outputs, with SIGINT multi-level quit.
"""

from __future__ import annotations

import dataclasses
import signal
import time

import numpy as np

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.io import save
from ohm_tpu.io.slam import SlamCloudLoader
from ohm_tpu.utils.progress import ProgressMonitor
from ohm_tpu.utils.log import get_logger
from ohm_tpu.utils.trace import Trace, TracingRayMapper

log = get_logger("app")


@dataclasses.dataclass
class MapOptions:
    """Map options (reference: MapHarness::MapOptions + OhmAppCpu options)."""

    resolution: float = 0.1
    region_dim: int = 32
    hit_probability: float = 0.9
    miss_probability: float = 0.45
    threshold_probability: float = 0.5
    voxel_mean: bool = False
    traversal: bool = False
    touch_time: bool = False
    incident_normal: bool = False
    mode: str = "occupancy"  # occupancy | ndt | ndt-tm | tsdf
    # NDT parameters (reference: NdtMapDetail defaults):
    sensor_noise: float = 0.05
    ndt_sample_threshold: int = 3
    ndt_adaptation_rate: float = 0.0
    # TSDF parameters:
    tsdf_max_weight: float = 1e4
    tsdf_truncation: float = 0.1
    # Device options (reference: OhmAppGpu GpuOptions):
    device: str = "tpu"  # tpu | cpu (oracle)
    arena_capacity: int = 2048
    batch_size: int = 4096
    ray_length_max: float = 0.0


@dataclasses.dataclass
class OutputOptions:
    base_name: str = "map"
    save_map: bool = True
    save_cloud: bool = True
    save_info: bool = False
    trace: str = ""
    quiet: bool = False


def build_mapper(map_options: MapOptions):
    """Construct (OccupancyMap, ray mapper) per the options
    (reference: OhmAppCpu/OhmAppGpu prepareForRun)."""
    flags = MapFlag.NONE
    if map_options.voxel_mean:
        flags |= MapFlag.VOXEL_MEAN
    if map_options.traversal:
        flags |= MapFlag.TRAVERSAL
    if map_options.touch_time:
        flags |= MapFlag.TOUCH_TIME
    if map_options.incident_normal:
        flags |= MapFlag.INCIDENT_NORMAL

    m = OccupancyMap(resolution=map_options.resolution,
                     region_voxel_dims=map_options.region_dim, flags=flags)
    m.set_hit_probability(map_options.hit_probability)
    m.set_miss_probability(map_options.miss_probability)
    m.set_occupancy_threshold_probability(map_options.threshold_probability)
    if map_options.ray_length_max > 0:
        from ohm_tpu.core.filters import clip_ray_filter

        max_len = map_options.ray_length_max
        m.ray_filter = lambda s, e: clip_ray_filter(s, e, max_len)

    mode = map_options.mode
    if map_options.device == "tpu":
        # Graceful fallback when no accelerator platform is usable
        # (reference analogue: gpu_ok guards, ohmgpu/GpuMap.cpp:548-551).
        try:
            import jax

            jax.devices()
        except Exception as exc:
            from ohm_tpu.utils.log import get_logger

            get_logger("app").warning("device init failed (%s); falling back to CPU oracle", exc)
            map_options.device = "cpu"
    if map_options.device == "cpu":
        if mode in ("ndt", "ndt-tm"):
            from ohm_tpu.oracle.ndt import RayMapperNdt, NdtParams

            mapper = RayMapperNdt(m, NdtParams(
                sensor_noise=map_options.sensor_noise,
                sample_threshold=map_options.ndt_sample_threshold,
                adaptation_rate=map_options.ndt_adaptation_rate,
                ndt_tm=mode == "ndt-tm"))
        elif mode == "tsdf":
            from ohm_tpu.oracle.tsdf import RayMapperTsdf, TsdfOptions

            mapper = RayMapperTsdf(m, TsdfOptions(
                max_weight=map_options.tsdf_max_weight,
                default_truncation_distance=map_options.tsdf_truncation))
        else:
            from ohm_tpu.oracle.occupancy import RayMapperOccupancy

            mapper = RayMapperOccupancy(m)
    else:
        if mode in ("ndt", "ndt-tm"):
            from ohm_tpu.mapping.ndt_map import TpuNdtMap
            from ohm_tpu.oracle.ndt import NdtParams

            mapper = TpuNdtMap(m, NdtParams(
                sensor_noise=map_options.sensor_noise,
                sample_threshold=map_options.ndt_sample_threshold,
                adaptation_rate=map_options.ndt_adaptation_rate,
                ndt_tm=mode == "ndt-tm"), capacity=map_options.arena_capacity)
        elif mode == "tsdf":
            from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
            from ohm_tpu.oracle.tsdf import TsdfOptions

            mapper = TpuTsdfMap(m, TsdfOptions(
                max_weight=map_options.tsdf_max_weight,
                default_truncation_distance=map_options.tsdf_truncation),
                capacity=map_options.arena_capacity)
        else:
            from ohm_tpu.mapping.tpu_map import TpuRayMapper

            mapper = TpuRayMapper(m, capacity=map_options.arena_capacity)
    return m, mapper


class MapHarness:
    """Run loop: data source -> mapper batches -> finalise -> save.

    Reference: MapHarness::run (ohmapp/MapHarness.cpp) including the
    SIGINT quit-level escalation (ohmapp/ohmappmain.inl:18-53).
    """

    def __init__(self, map_options: MapOptions, output: OutputOptions, source: SlamCloudLoader):
        self.map_options = map_options
        self.output = output
        self.source = source
        self.quit_level = 0
        self.map = None
        self.mapper = None
        self.stats = {}

    def _install_signals(self):
        def on_sigint(_sig, _frame):
            self.quit_level += 1
            if self.quit_level > 2:
                raise KeyboardInterrupt

        try:
            signal.signal(signal.SIGINT, on_sigint)
        except ValueError:
            pass  # not on the main thread (tests)

    def run(self) -> int:
        from ohm_tpu.utils.cache import enable_persistent_cache

        try:
            enable_persistent_cache()
        except Exception:
            pass
        self._install_signals()
        self.map, self.mapper = build_mapper(self.map_options)
        mapper = self.mapper
        trace = None
        if self.output.trace:
            trace = Trace(self.output.trace)
            mapper = TracingRayMapper(mapper, trace)

        progress = ProgressMonitor(label="rays ")
        progress.set_target(self.source.point_count)
        if not self.output.quiet:
            progress.start_thread()

        t0 = time.perf_counter()
        total_rays = 0
        while self.quit_level == 0:
            batch = self.source.next_batch(self.map_options.batch_size)
            if batch is None:
                break
            rays, timestamps, intensities = batch
            n = mapper.integrate_rays(rays, intensities=intensities, timestamps=timestamps)
            total_rays += n
            progress.increment(n)
        if hasattr(mapper, "sync_voxels"):
            mapper.sync_voxels()
        elapsed = time.perf_counter() - t0
        progress.join(display_final=not self.output.quiet)

        self.stats = {
            "rays": total_rays,
            "elapsed_s": elapsed,
            "rays_per_sec": total_rays / max(elapsed, 1e-9),
            "regions": self.map.region_count(),
        }
        if not self.output.quiet:
            log.info("Total processing time: %.3f s (%s rays, %.0f rays/s)",
                     elapsed, total_rays, self.stats["rays_per_sec"])

        if self.output.save_info:
            self.map.info["generator"] = "ohm_tpu ohmpop"
            self.map.info["mode"] = self.map_options.mode
            self.map.info["rays"] = total_rays
        if self.output.save_map:
            save(self.output.base_name + ".ohm", self.map)
        if self.output.save_cloud:
            self._save_cloud(self.output.base_name + ".ply")
        if trace:
            trace.close()
        return 0

    def _save_cloud(self, filename: str):
        """One point per occupied voxel, mean position preferred
        (reference: ohmpop default PLY output)."""
        from ohm_tpu.app.export import occupied_points

        pts = occupied_points(self.map)
        from ohm_tpu.io.ply import save_cloud_ply

        save_cloud_ply(filename, pts)
