"""Core map data model: keys, layout schema, host-side region store.

Reference parity: ohm/Key.h, ohm/MapCoord.h, ohm/MapLayout.h, ohm/MapChunk.h,
ohm/OccupancyMap.h (see SURVEY.md section 2.1).
"""
