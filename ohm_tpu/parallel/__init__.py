"""Multi-chip spatial sharding of the occupancy map (new capability).

The reference is single-device (SURVEY.md section 2.9); scaling the map
across TPU chips over ICI is the genuinely new axis this framework adds:
each device owns a spatial shard of the region set (ownership by region
hash), ray batches are replicated, and every device integrates only the
voxel records that land in regions it owns — no CAS, no cross-device
write conflicts, no collectives in the hot path.
"""

from ohm_tpu.parallel.sharded import ShardedArena, sharded_integrate
