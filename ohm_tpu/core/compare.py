"""Map comparison utilities (reference: ohm/CompareMaps.{h,cpp}).

Structural (layout) and per-voxel content comparison with severity logging —
used for CPU-vs-TPU validation and the ohmcmp tool.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CompareResult:
    layout_match: bool = True
    regions_compared: int = 0
    voxels_compared: int = 0
    voxels_failed: int = 0
    missing_regions: int = 0
    messages: list = dataclasses.field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.layout_match and self.voxels_failed == 0 and self.missing_regions == 0


def compare_layout(ref_map, test_map, result: CompareResult | None = None) -> CompareResult:
    """Layer schema equivalence (reference: CompareMaps::compareLayoutLayer)."""
    result = result or CompareResult()
    for layer in ref_map.layout:
        other = test_map.layout.layer(layer.name)
        if other is None:
            result.layout_match = False
            result.messages.append(f"layer {layer.name!r} missing from test map")
            continue
        if not layer.voxel_layout.equals(other.voxel_layout):
            result.layout_match = False
            result.messages.append(f"layer {layer.name!r} voxel schema mismatch")
    return result


def compare_voxels(ref_map, test_map, layers=None, tolerance: float = 0.0,
                   result: CompareResult | None = None, log_limit: int = 20) -> CompareResult:
    """Per-voxel comparison over the reference map's regions."""
    result = result or CompareResult()
    layers = layers or [l.name for l in ref_map.layout if test_map.layout.layer(l.name)]
    for key, ref_chunk in ref_map.chunks.items():
        test_chunk = test_map.region(key)
        if test_chunk is None:
            result.missing_regions += 1
            if len(result.messages) < log_limit:
                result.messages.append(f"region {key} missing from test map")
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
                    bad = ~(both_nan | same_inf) & ~(diff <= tolerance)
                    bad &= ~(np.isfinite(a) & np.isfinite(b) & (diff <= tolerance))
                else:
                    bad = a != b
                n_bad = int(np.count_nonzero(bad))
                if n_bad:
                    result.voxels_failed += n_bad
                    if len(result.messages) < log_limit:
                        result.messages.append(
                            f"region {key} layer {name}.{member}: {n_bad} voxels differ")
    return result


def compare_maps(ref_map, test_map, tolerance: float = 0.0) -> CompareResult:
    """Full comparison (reference: ohmcmp / CompareMaps usage)."""
    result = compare_layout(ref_map, test_map)
    if result.layout_match:
        compare_voxels(ref_map, test_map, tolerance=tolerance, result=result)
    return result
