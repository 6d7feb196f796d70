"""TPU ray mappers and the HBM region arena.

Plays the role of the reference's ohmgpu layer: GpuMap/GpuNdtMap/GpuTsdfMap
(ray integration drivers) and GpuCache/GpuLayerCache (host<->device region
paging).  See SURVEY.md sections 2.5 and 7.
"""

from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.mapping.arena import VoxelArena
