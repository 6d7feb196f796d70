"""Map queries (reference: ohm/Query*, ohmgpu/*QueryGpu, ohmgpu/ClearanceProcess).

All queries run the device pipeline when useful and fall back to vectorised
host math for small/sparse work, mirroring the reference's CPU/GPU split.
"""

from ohm_tpu.query.rays_query import RaysQuery, OccupancyType
from ohm_tpu.query.line_keys import LineKeysQuery
from ohm_tpu.query.nearest import NearestNeighbours
from ohm_tpu.query.line_query import LineQuery
from ohm_tpu.query.clearance import ClearanceProcess
from ohm_tpu.query.base import AsyncQueryMixin
