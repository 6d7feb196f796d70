"""Device region hash table: region coordinate -> arena slot lookup.

TPU-native replacement for the reference's per-kernel region offset arrays
with linear search (ohmgpu/gpu/Regions.cl:47-70) and the GpuLayerCache
region->offset hash (ohmgpu/GpuLayerCache.cpp).  The table is
host-authoritative: the host inserts/evicts entries (mapping.arena) and
mirrors them into two device arrays; the device performs vectorised
open-addressing lookups with a static probe depth.

Layout:
  table_ab   int32[T]  packed (x | y << 16) region coords, or EMPTY_AB
  table_z    int32[T]  z region coord
  table_slot int32[T]  arena slot index, -1 when the entry is empty

T is a power of two.  Probe sequence: (h + k) & (T - 1), k < PROBE_DEPTH.
Host insertion uses the identical sequence (see mapping.arena), so any
region the host placed is found by the device within PROBE_DEPTH probes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PROBE_DEPTH = 8
EMPTY_AB = np.int32(0x7FFFFFFF)  # unreachable packed value (x=0xFFFF & y=0x7FFF)


def hash_region(x, y, z, table_size):
    """Spatial hash over region coords; identical in numpy (host) and jnp (device).

    Uses int32 wraparound multiplication (classic Teschner et al. spatial
    hash constants, as in ohmutil/VectorHash.h's approach).
    """
    h = (x * np.int32(73856093)) ^ (y * np.int32(19349669)) ^ (z * np.int32(83492791))
    return h & (table_size - 1)


def pack_ab(x, y):
    """Pack x/y region coords into one int32: (x & 0xFFFF) | (y << 16)."""
    return (x & 0xFFFF) | (y << 16)


def lookup_slots(region, table_ab, table_z, table_slot):
    """Vectorised lookup: region int32[...,3] -> slot int32[...] (-1 on miss)."""
    table_size = table_ab.shape[0]
    x = region[..., 0]
    y = region[..., 1]
    z = region[..., 2]
    ab = pack_ab(x, y)
    h = hash_region(x, y, z, jnp.int32(table_size))

    slot = jnp.full(x.shape, -1, dtype=jnp.int32)
    found = jnp.zeros(x.shape, dtype=bool)
    for k in range(PROBE_DEPTH):
        idx = (h + k) & (table_size - 1)
        match = (table_ab[idx] == ab) & (table_z[idx] == z) & ~found
        slot = jnp.where(match, table_slot[idx], slot)
        found = found | match
    return slot


class HostRegionTable:
    """Host mirror of the device table, with insertion and resize.

    The host is the source of truth; `device_arrays()` materialises the jnp
    copies after mutation.  Probe sequence must match `lookup_slots`.
    """

    def __init__(self, table_size: int = 1 << 13):
        assert table_size & (table_size - 1) == 0, "table size must be a power of two"
        self.table_size = table_size
        self.ab = np.full(table_size, EMPTY_AB, dtype=np.int32)
        self.z = np.zeros(table_size, dtype=np.int32)
        self.slot = np.full(table_size, -1, dtype=np.int32)
        self.count = 0
        self.dirty = True

    def insert(self, region, slot: int):
        """Insert one region -> slot mapping; grows the table on probe overflow."""
        x, y, z = (np.int32(v) for v in region)
        ab = np.int32(pack_ab(x, y))
        while True:
            h = int(hash_region(x, y, z, np.int32(self.table_size)))
            for k in range(PROBE_DEPTH):
                idx = (h + k) & (self.table_size - 1)
                if self.slot[idx] < 0 or (self.ab[idx] == ab and self.z[idx] == z):
                    self.ab[idx] = ab
                    self.z[idx] = z
                    self.slot[idx] = slot
                    self.count += 1
                    self.dirty = True
                    return
            self._grow()

    def remove(self, region):
        """Remove a region (used on eviction). Rebuilds the probe chain."""
        x, y, z = (np.int32(v) for v in region)
        ab = np.int32(pack_ab(x, y))
        h = int(hash_region(x, y, z, np.int32(self.table_size)))
        for k in range(PROBE_DEPTH):
            idx = (h + k) & (self.table_size - 1)
            if self.ab[idx] == ab and self.z[idx] == z and self.slot[idx] >= 0:
                # Tombstone-free removal: re-insert the rest of this probe
                # window so lookups never stop early at a hole.
                self.ab[idx] = EMPTY_AB
                self.slot[idx] = -1
                self.count -= 1
                self.dirty = True
                # Reinsert any displaced entries in the window following idx.
                j = (idx + 1) & (self.table_size - 1)
                while self.slot[j] >= 0:
                    rab, rz, rslot = self.ab[j], self.z[j], self.slot[j]
                    self.ab[j] = EMPTY_AB
                    self.slot[j] = -1
                    self.count -= 1
                    rx = np.int32((int(rab) & 0xFFFF) - 0x10000 if (int(rab) & 0x8000) else int(rab) & 0xFFFF)
                    ry = np.int32(int(rab) >> 16)
                    self.insert((rx, ry, rz), int(rslot))
                    j = (j + 1) & (self.table_size - 1)
                return True
        return False

    def _grow(self):
        entries = [(self.ab[i], self.z[i], self.slot[i]) for i in range(self.table_size) if self.slot[i] >= 0]
        self.table_size *= 2
        self.ab = np.full(self.table_size, EMPTY_AB, dtype=np.int32)
        self.z = np.zeros(self.table_size, dtype=np.int32)
        self.slot = np.full(self.table_size, -1, dtype=np.int32)
        self.count = 0
        self.dirty = True
        for ab, z, slot in entries:
            x = np.int32((int(ab) & 0xFFFF) - 0x10000 if (int(ab) & 0x8000) else int(ab) & 0xFFFF)
            y = np.int32(int(ab) >> 16)
            self.insert((x, y, z), int(slot))

    def device_arrays(self):
        return jnp.asarray(self.ab), jnp.asarray(self.z), jnp.asarray(self.slot)

    def lookup_np(self, region: np.ndarray) -> np.ndarray:
        """Vectorised host lookup: region int (...,3) -> slot (...), -1 on miss.

        Same probe sequence as the device `lookup_slots`; used by the batch
        preparer to resolve per-segment corner slots so the device needs no
        table gathers in the hot path.
        """
        region = np.asarray(region)
        x = region[..., 0].astype(np.int32)
        y = region[..., 1].astype(np.int32)
        z = region[..., 2].astype(np.int32)
        ab = pack_ab(x, y)
        h = hash_region(x, y, z, np.int32(self.table_size))
        slot = np.full(x.shape, -1, dtype=np.int32)
        found = np.zeros(x.shape, dtype=bool)
        for k in range(PROBE_DEPTH):
            idx = (h + k) & (self.table_size - 1)
            match = (self.ab[idx] == ab) & (self.z[idx] == z) & ~found
            slot = np.where(match, self.slot[idx], slot)
            found |= match
        return slot
