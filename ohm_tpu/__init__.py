"""ohm_tpu — a TPU-native occupancy mapping engine (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of csiro-robotics/ohm (reference:
probabilistic voxel occupancy maps stored as homogeneous voxel regions,
populated by integrating lidar rays) designed for TPU hardware:

- The region store is a device-resident HBM arena of dense per-layer arrays
  indexed by a hash region table, instead of heap chunks + GPU paging.
- Ray integration is a fused expand -> sort -> segment-reduce -> scatter
  pipeline (deterministic, conflict free), instead of per-ray CAS loops
  (reference: ohmgpu/gpu/RegionUpdate.cl).
- A double-precision CPU oracle (`ohm_tpu.oracle`) reproduces the reference
  CPU semantics (reference: ohm/RayMapperOccupancy.cpp) for differential
  testing, mirroring the reference's CPU-vs-GPU test strategy.

Layer map (mirrors reference layering, see SURVEY.md):
  core/      Key math, layout schema, host map store   (reference: ohm/)
  oracle/    f64 reference ray mappers                  (reference: ohm/RayMapper*)
  ops/       TPU kernels: DDA expansion, sort-reduce    (reference: ohmgpu/gpu/*.cl)
  mapping/   TPU ray mappers + region arena             (reference: ohmgpu/GpuMap*)
  query/     map queries                                (reference: ohm/Query*)
  heightmap/ 2.5D extraction                            (reference: ohmheightmap/)
  io/        .ohm serialisation + point cloud ingest    (reference: ohm/MapSerialise*, slamio/)
  app/       CLI harness                                (reference: ohmapp/, utils/)
  parallel/  multi-chip spatial sharding (new capability)
"""

__version__ = "0.1.0"

from ohm_tpu.core.probability import probability_to_value, value_to_probability
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import MapLayout, MapLayer, VoxelLayout, DataType, default_layout
from ohm_tpu.core.rayflags import RayFlag, RayFilterFlag


def __getattr__(name):
    # Lazy heavyweight imports (jax-dependent) so `import ohm_tpu` stays light.
    if name == "TpuRayMapper":
        from ohm_tpu.mapping.tpu_map import TpuRayMapper

        return TpuRayMapper
    if name == "TpuNdtMap":
        from ohm_tpu.mapping.ndt_map import TpuNdtMap

        return TpuNdtMap
    if name == "TpuTsdfMap":
        from ohm_tpu.mapping.tsdf_map import TpuTsdfMap

        return TpuTsdfMap
    if name in ("save", "load"):
        from ohm_tpu.io import serialise

        return getattr(serialise, name)
    raise AttributeError(name)
