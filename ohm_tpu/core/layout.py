"""Map layout schema: named voxel layers with typed members.

Reference parity: ohm/MapLayout.h, ohm/MapLayer.h, ohm/VoxelLayout.cpp,
ohm/DefaultLayer.cpp, ohm/DataType.h.  The schema drives both the host numpy
storage (structured dtypes whose byte layout matches the reference voxel
structs, which is load-bearing for .ohm serialisation) and the device arena
layout (each layer maps to one or more flat device arrays).
"""

from __future__ import annotations

import dataclasses
import struct
from enum import IntEnum
from typing import Optional

import numpy as np


class DataType(IntEnum):
    """Voxel member data types (reference: ohm/DataType.h:17-33)."""

    UNKNOWN = 0
    INT8 = 1
    UINT8 = 2
    INT16 = 3
    UINT16 = 4
    INT32 = 5
    UINT32 = 6
    INT64 = 7
    UINT64 = 8
    FLOAT = 9
    DOUBLE = 10
    STRUCT = 11
    USER = 256


_NUMPY_DTYPE = {
    DataType.INT8: np.int8,
    DataType.UINT8: np.uint8,
    DataType.INT16: np.int16,
    DataType.UINT16: np.uint16,
    DataType.INT32: np.int32,
    DataType.UINT32: np.uint32,
    DataType.INT64: np.int64,
    DataType.UINT64: np.uint64,
    DataType.FLOAT: np.float32,
    DataType.DOUBLE: np.float64,
}

_TYPE_SIZE = {k: np.dtype(v).itemsize for k, v in _NUMPY_DTYPE.items()}


def numpy_type(data_type: DataType):
    return _NUMPY_DTYPE[DataType(data_type)]


@dataclasses.dataclass
class VoxelMember:
    """One member of a voxel struct (reference: ohm/VoxelLayout.cpp addMember)."""

    name: str
    type: DataType
    #: Raw clear pattern: low `size` bytes initialise the member
    #: (reference stores the clear value as a uint64 bit pattern).
    clear_value: int = 0
    offset: int = 0  # byte offset within the voxel struct; assigned by VoxelLayout

    @property
    def byte_size(self) -> int:
        return _TYPE_SIZE[DataType(self.type)]

    def clear_scalar(self):
        """Decode the clear bit pattern into the member's native scalar."""
        raw = struct.pack("<Q", self.clear_value & 0xFFFFFFFFFFFFFFFF)[: self.byte_size]
        return np.frombuffer(raw, dtype=numpy_type(self.type))[0]


class VoxelLayout:
    """Voxel struct schema for one layer (reference: ohm/VoxelLayout.cpp).

    Members are packed sequentially with no padding, matching the reference's
    explicit offset accounting.
    """

    def __init__(self):
        self.members: list[VoxelMember] = []

    def add_member(self, name: str, data_type: DataType, clear_value: int = 0) -> VoxelMember:
        offset = self.voxel_byte_size()
        member = VoxelMember(name=name, type=DataType(data_type), clear_value=int(clear_value), offset=offset)
        self.members.append(member)
        return member

    def voxel_byte_size(self) -> int:
        return sum(m.byte_size for m in self.members)

    def member_index(self, name: str) -> int:
        for i, m in enumerate(self.members):
            if m.name == name:
                return i
        return -1

    def numpy_dtype(self) -> np.dtype:
        """Packed structured dtype matching the reference voxel struct bytes."""
        return np.dtype(
            {
                "names": [m.name for m in self.members],
                "formats": [numpy_type(m.type) for m in self.members],
                "offsets": [m.offset for m in self.members],
                "itemsize": self.voxel_byte_size(),
            }
        )

    def clear_record(self) -> np.void:
        """One voxel record holding every member's clear value."""
        rec = np.zeros((), dtype=self.numpy_dtype())
        for m in self.members:
            rec[m.name] = m.clear_scalar()
        return rec

    def equals(self, other: "VoxelLayout") -> bool:
        if len(self.members) != len(other.members):
            return False
        return all(
            a.name == b.name and a.type == b.type and a.offset == b.offset and a.clear_value == b.clear_value
            for a, b in zip(self.members, other.members)
        )


class MapLayer:
    """One named voxel layer (reference: ohm/MapLayer.h)."""

    #: Layer flag: data not serialised to disk (reference: ohm/MapLayer.h:32-36).
    SKIP_SERIALISE = 1 << 0

    def __init__(self, name: str, layer_index: int = 0, subsampling: int = 0):
        self.name = name
        self.layer_index = layer_index
        self.subsampling = subsampling
        self.flags = 0
        self.voxel_layout = VoxelLayout()

    def dimensions(self, region_voxel_dims) -> np.ndarray:
        """Layer voxel dimensions after subsampling (reference: ohm/MapLayer.h dimensions)."""
        dims = np.asarray(region_voxel_dims, dtype=np.int32)
        if self.subsampling:
            dims = np.maximum(dims // (1 << self.subsampling), 1)
        return dims

    def volume(self, region_voxel_dims) -> int:
        return int(np.prod(self.dimensions(region_voxel_dims)))

    def voxel_byte_size(self) -> int:
        return self.voxel_layout.voxel_byte_size()


# Well-known layer names (reference: ohm/DefaultLayer.cpp:29-69).
OCCUPANCY_LAYER = "occupancy"
MEAN_LAYER = "mean"
TRAVERSAL_LAYER = "traversal"
COVARIANCE_LAYER = "covariance"
CLEARANCE_LAYER = "clearance"
INTENSITY_LAYER = "intensity"
HIT_MISS_COUNT_LAYER = "hit_miss_count"
TOUCH_TIME_LAYER = "touch_time"
INCIDENT_NORMAL_LAYER = "incident_normal"
TSDF_LAYER = "tsdf"
SECONDARY_SAMPLES_LAYER = "secondary_samples"


def _float_bits(value: float) -> int:
    return struct.unpack("<I", struct.pack("<f", np.float32(value)))[0]


class MapLayout:
    """Ordered collection of layers (reference: ohm/MapLayout.h:23-36)."""

    def __init__(self):
        self.layers: list[MapLayer] = []

    def add_layer(self, name: str, subsampling: int = 0) -> MapLayer:
        layer = MapLayer(name, layer_index=len(self.layers), subsampling=subsampling)
        self.layers.append(layer)
        return layer

    def layer_index(self, name: str) -> int:
        for i, layer in enumerate(self.layers):
            if layer.name == name:
                return i
        return -1

    def layer(self, name: str) -> Optional[MapLayer]:
        idx = self.layer_index(name)
        return self.layers[idx] if idx >= 0 else None

    def __len__(self) -> int:
        return len(self.layers)

    def __iter__(self):
        return iter(self.layers)

    # -- default layer creators (reference: ohm/DefaultLayer.cpp:93-300) --

    def add_occupancy(self) -> MapLayer:
        existing = self.layer(OCCUPANCY_LAYER)
        if existing:
            return existing
        layer = self.add_layer(OCCUPANCY_LAYER)
        layer.voxel_layout.add_member(OCCUPANCY_LAYER, DataType.FLOAT, _float_bits(float("inf")))
        return layer

    def add_mean(self) -> MapLayer:
        existing = self.layer(MEAN_LAYER)
        if existing:
            return existing
        layer = self.add_layer(MEAN_LAYER)
        layer.voxel_layout.add_member("coord", DataType.UINT32, 0)
        layer.voxel_layout.add_member("count", DataType.UINT32, 0)
        return layer

    def add_traversal(self) -> MapLayer:
        existing = self.layer(TRAVERSAL_LAYER)
        if existing:
            return existing
        layer = self.add_layer(TRAVERSAL_LAYER)
        layer.voxel_layout.add_member("traversal", DataType.FLOAT, 0)
        return layer

    def add_covariance(self) -> MapLayer:
        existing = self.layer(COVARIANCE_LAYER)
        if existing:
            return existing
        layer = self.add_layer(COVARIANCE_LAYER)
        for name in ("P00", "P01", "P11", "P02", "P12", "P22"):
            layer.voxel_layout.add_member(name, DataType.FLOAT, 0)
        return layer

    def add_clearance(self) -> MapLayer:
        existing = self.layer(CLEARANCE_LAYER)
        if existing:
            return existing
        layer = self.add_layer(CLEARANCE_LAYER)
        layer.voxel_layout.add_member(CLEARANCE_LAYER, DataType.FLOAT, _float_bits(-1.0))
        return layer

    def add_intensity(self) -> MapLayer:
        existing = self.layer(INTENSITY_LAYER)
        if existing:
            return existing
        layer = self.add_layer(INTENSITY_LAYER)
        layer.voxel_layout.add_member("mean", DataType.FLOAT, 0)
        layer.voxel_layout.add_member("cov", DataType.FLOAT, 0)
        return layer

    def add_hit_miss_count(self) -> MapLayer:
        existing = self.layer(HIT_MISS_COUNT_LAYER)
        if existing:
            return existing
        layer = self.add_layer(HIT_MISS_COUNT_LAYER)
        layer.voxel_layout.add_member("hit_count", DataType.UINT32, 0)
        layer.voxel_layout.add_member("miss_count", DataType.UINT32, 0)
        return layer

    def add_touch_time(self) -> MapLayer:
        existing = self.layer(TOUCH_TIME_LAYER)
        if existing:
            return existing
        layer = self.add_layer(TOUCH_TIME_LAYER)
        layer.voxel_layout.add_member("touch", DataType.UINT32, 0)
        return layer

    def add_incident_normal(self) -> MapLayer:
        existing = self.layer(INCIDENT_NORMAL_LAYER)
        if existing:
            return existing
        layer = self.add_layer(INCIDENT_NORMAL_LAYER)
        layer.voxel_layout.add_member("packed_normal", DataType.UINT32, 0)
        return layer

    def add_tsdf(self) -> MapLayer:
        existing = self.layer(TSDF_LAYER)
        if existing:
            return existing
        layer = self.add_layer(TSDF_LAYER)
        layer.voxel_layout.add_member("weight", DataType.FLOAT, 0)
        layer.voxel_layout.add_member("distance", DataType.FLOAT, 0)
        return layer

    def add_secondary_samples(self) -> MapLayer:
        existing = self.layer(SECONDARY_SAMPLES_LAYER)
        if existing:
            return existing
        layer = self.add_layer(SECONDARY_SAMPLES_LAYER)
        layer.voxel_layout.add_member("m2", DataType.FLOAT, 0)
        layer.voxel_layout.add_member("range_mean", DataType.UINT16, 0)
        layer.voxel_layout.add_member("count", DataType.UINT16, 0)
        return layer


def default_layout(occupancy: bool = True) -> MapLayout:
    """The default map layout: occupancy only (reference: OccupancyMapDetail::setDefaultLayout)."""
    layout = MapLayout()
    if occupancy:
        layout.add_occupancy()
    return layout
