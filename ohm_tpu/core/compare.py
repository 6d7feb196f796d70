"""Map comparison utilities (reference: ohm/CompareMaps.{h,cpp}).

Structural (layout) and per-voxel content comparison with the reference's
severity model: levelled Log callbacks (Severity kInfo/kWarning/kError —
CompareMaps.h:32-38), a kContinue flag selecting continue-vs-stop-on-error
(CompareMaps.h:41-45), per-layer entry points and a VoxelsResult-style
summary.  Used for CPU-vs-TPU validation and the ohmcmp tool.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np


class Severity(enum.IntEnum):
    """Reference: ohm/CompareMaps.h:32-38."""

    INFO = 0
    WARNING = 1
    ERROR = 2


class Flag(enum.IntFlag):
    """Reference: ohm/CompareMaps.h:41-45."""

    ZERO = 0
    CONTINUE = 1  #: continue comparing after the first error


class CompareStop(Exception):
    """Raised internally to stop a comparison when kContinue is not set."""


@dataclasses.dataclass
class CompareResult:
    """Aggregate result (superset of the reference VoxelsResult:
    voxels_passed/voxels_failed/layout_match, CompareMaps.h:48-56)."""

    layout_match: bool = True
    regions_compared: int = 0
    voxels_compared: int = 0
    voxels_passed: int = 0
    voxels_failed: int = 0
    missing_regions: int = 0
    messages: list = dataclasses.field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.layout_match and self.voxels_failed == 0 and self.missing_regions == 0

    def __bool__(self) -> bool:  # reference: explicit operator bool
        return self.ok


def _make_log(result: CompareResult, log, flags: Flag, log_limit: int):
    def emit(severity: Severity, msg: str):
        if log is not None:
            log(severity, msg)
        elif len(result.messages) < log_limit:
            result.messages.append((severity, msg))
        if severity >= Severity.ERROR and not (flags & Flag.CONTINUE):
            raise CompareStop(msg)

    return emit


def compare_layout_layer(ref_map, test_map, layer_name: str,
                         flags: Flag = Flag.CONTINUE, log=None,
                         result: CompareResult | None = None) -> CompareResult:
    """Schema equivalence of one named layer
    (reference: CompareMaps::compareLayoutLayer, CompareMaps.h:71-81)."""
    result = result or CompareResult()
    emit = _make_log(result, log, flags, log_limit=64)
    try:
        layer = ref_map.layout.layer(layer_name)
        other = test_map.layout.layer(layer_name)
        if layer is None or other is None:
            result.layout_match = False
            emit(Severity.ERROR, f"layer {layer_name!r} missing from "
                                 f"{'reference' if layer is None else 'test'} map")
            return result
        if not layer.voxel_layout.equals(other.voxel_layout):
            result.layout_match = False
            emit(Severity.ERROR, f"layer {layer_name!r} voxel schema mismatch")
    except CompareStop:
        pass
    return result


def compare_layout(ref_map, test_map, flags: Flag = Flag.CONTINUE, log=None,
                   result: CompareResult | None = None) -> CompareResult:
    """Layer schema equivalence over every reference layer."""
    result = result or CompareResult()
    try:
        for layer in ref_map.layout:
            compare_layout_layer(ref_map, test_map, layer.name,
                                 flags=Flag.ZERO if not (flags & Flag.CONTINUE) else flags,
                                 log=log, result=result)
            if not result.layout_match and not (flags & Flag.CONTINUE):
                break
    except CompareStop:
        pass
    return result


def compare_voxels(ref_map, test_map, layers=None, tolerance: float = 0.0,
                   flags: Flag = Flag.CONTINUE, log=None,
                   result: CompareResult | None = None, log_limit: int = 20) -> CompareResult:
    """Per-voxel comparison over the reference map's regions
    (reference: CompareMaps::compareVoxels, CompareMaps.h:127-141)."""
    result = result or CompareResult()
    emit = _make_log(result, log, flags, log_limit)
    layers = layers or [l.name for l in ref_map.layout if test_map.layout.layer(l.name)]
    try:
        for key, ref_chunk in ref_map.chunks.items():
            test_chunk = test_map.region(key)
            if test_chunk is None:
                result.missing_regions += 1
                emit(Severity.ERROR, f"region {key} missing from test map")
                continue
            result.regions_compared += 1
            for name in layers:
                ri = ref_map.layout.layer_index(name)
                ti = test_map.layout.layer_index(name)
                ra = ref_chunk.layers[ri]
                ta = test_chunk.layers[ti]
                for member in ra.dtype.names:
                    a = ra[member]
                    b = ta[member]
                    result.voxels_compared += a.size
                    if np.issubdtype(a.dtype, np.floating):
                        both_nan = ~np.isfinite(a) & ~np.isfinite(b)
                        same_inf = (a == b) & ~np.isfinite(a)
                        diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
                        good = both_nan | same_inf | (
                            np.isfinite(a) & np.isfinite(b) & (diff <= tolerance))
                        bad = ~good
                    else:
                        bad = a != b
                    n_bad = int(np.count_nonzero(bad))
                    result.voxels_passed += a.size - n_bad
                    if n_bad:
                        result.voxels_failed += n_bad
                        emit(Severity.ERROR,
                             f"region {key} layer {name}.{member}: {n_bad} voxels differ")
    except CompareStop:
        pass
    return result


def compare_maps(ref_map, test_map, tolerance: float = 0.0,
                 flags: Flag = Flag.CONTINUE, log=None) -> CompareResult:
    """Full comparison (reference: ohmcmp / CompareMaps usage): layout first,
    voxels only when the layout matches (VoxelsResult.layout_match gate)."""
    result = compare_layout(ref_map, test_map, flags=flags, log=log)
    if result.layout_match:
        compare_voxels(ref_map, test_map, tolerance=tolerance, flags=flags,
                       log=log, result=result)
    return result
