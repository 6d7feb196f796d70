"""CompareMaps parity tests (reference: ohm/CompareMaps.{h,cpp},
tests/ohmtest/CompareTests.cpp).

Covers the reference tolerance model — per-member typed epsilons
(configureTolerance, CompareMaps.cpp:391-470), exact raw comparison when no
epsilon is configured, unsigned-safe integer diffs (compareDatum swaps to
subtract from the larger, CompareMaps.cpp:66-73) — plus layout detail
messages, the kContinue stop semantics, and the single-voxel compareVoxel
entry point.
"""

import copy

import numpy as np

from ohm_tpu.core.compare import (CompareResult, Flag, Severity,
                                  compare_layout, compare_layout_layer,
                                  compare_maps, compare_voxel, compare_voxels,
                                  configure_tolerance)
from ohm_tpu.core.layout import OCCUPANCY_LAYER, DataType
from ohm_tpu.core.map import MapFlag, OccupancyMap
from ohm_tpu.oracle.occupancy import RayMapperOccupancy


def build_map(flags=MapFlag.VOXEL_MEAN | MapFlag.TRAVERSAL, seed=7):
    m = OccupancyMap(resolution=0.25, flags=flags)
    rng = np.random.default_rng(seed)
    n = 40
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = np.empty((2 * n, 3))
    rays[0::2] = 0.0
    rays[1::2] = dirs * rng.uniform(1.0, 6.0, (n, 1))
    RayMapperOccupancy(m).integrate_rays(rays)
    return m


def first_chunk(m):
    return next(iter(m.chunks.values()))


def test_identical_maps_match():
    a = build_map()
    b = copy.deepcopy(a)
    result = compare_maps(a, b)
    assert result.ok and bool(result)
    assert result.voxels_failed == 0
    assert result.regions_compared == len(a.chunks)


def test_value_mismatch_detected_with_have_expect_detail():
    a = build_map()
    b = copy.deepcopy(a)
    occ_idx = a.layout.layer_index("occupancy")
    chunk = first_chunk(b)
    chunk.layers[occ_idx][OCCUPANCY_LAYER][0] = 123.0
    result = compare_maps(a, b)
    assert not result.ok
    assert result.voxels_failed >= 1
    # Reference memberValueErrorString: "have <val> expect <ref>".
    assert any("have" in msg and "expect" in msg for _, msg in result.messages)


def test_scalar_tolerance_applies_to_float_members():
    a = build_map()
    b = copy.deepcopy(a)
    occ_idx = a.layout.layer_index("occupancy")
    arr = first_chunk(b).layers[occ_idx][OCCUPANCY_LAYER]
    arr += np.float32(1e-4)
    assert not compare_maps(a, b).ok  # exact-by-default fails
    assert compare_maps(a, b, tolerance=1e-3).ok
    assert not compare_maps(a, b, tolerance=1e-5).ok


def test_per_member_typed_tolerance():
    a = build_map()
    b = copy.deepcopy(a)
    mean_idx = a.layout.layer_index("mean")
    chunk = first_chunk(b)
    chunk.layers[mean_idx]["count"] += np.uint32(2)

    # No tolerance on 'count': fails (int members are exact by default and
    # a scalar tolerance only covers float members).
    assert not compare_maps(a, b).ok
    assert not compare_maps(a, b, tolerance=5.0).ok

    # configureTolerance-style per-member integer epsilon.
    tol = configure_tolerance({}, "count", 2)
    assert compare_maps(a, b, tolerance=tol).ok
    assert not compare_maps(a, b, tolerance=configure_tolerance({}, "count", 1)).ok


def test_unsigned_diff_is_order_safe():
    # compareDatum subtracts from the larger side so unsigned members never
    # wrap (CompareMaps.cpp:66-73); check both directions of the diff.
    a = build_map()
    b = copy.deepcopy(a)
    mean_idx = a.layout.layer_index("mean")
    ca, cb = first_chunk(a), first_chunk(b)
    ca.layers[mean_idx]["count"][0] = np.uint32(1)
    cb.layers[mean_idx]["count"][0] = np.uint32(3)
    ca.layers[mean_idx]["count"][1] = np.uint32(3)
    cb.layers[mean_idx]["count"][1] = np.uint32(1)
    tol = configure_tolerance({}, "count", 2)
    assert compare_voxels(a, b, layers=["mean"], tolerance=tol).ok
    assert not compare_voxels(a, b, layers=["mean"],
                              tolerance=configure_tolerance({}, "count", 1)).ok


def test_missing_region_counts():
    a = build_map()
    b = copy.deepcopy(a)
    b.chunks.pop(next(iter(b.chunks)))
    result = compare_maps(a, b)
    assert not result.ok
    assert result.missing_regions == 1


def test_layout_mismatch_gates_voxel_compare():
    a = build_map(flags=MapFlag.VOXEL_MEAN)
    b = build_map(flags=MapFlag.NONE)
    result = compare_maps(a, b)
    assert not result.layout_match
    assert result.voxels_compared == 0  # layout gate (reference layout_match)


def test_layout_layer_member_detail_messages():
    a = build_map(flags=MapFlag.NONE)
    b = build_map(flags=MapFlag.NONE)
    layer = b.layout.layer("occupancy")
    member = layer.voxel_layout.members[0]
    member.name = "occupancy2"
    result = compare_layout_layer(a, b, "occupancy")
    assert not result.layout_match
    assert any("member name mismatch" in msg for _, msg in result.messages)
    member.name = "occupancy"
    member.type = DataType.DOUBLE
    result = compare_layout_layer(a, b, "occupancy")
    assert not result.layout_match
    assert any("type mismatch" in msg or "size mismatch" in msg
               for _, msg in result.messages)


def test_stop_on_first_error_without_continue():
    a = build_map()
    b = copy.deepcopy(a)
    occ_idx = a.layout.layer_index("occupancy")
    for chunk in b.chunks.values():
        chunk.layers[occ_idx][OCCUPANCY_LAYER][:] = 99.0
    cont = compare_voxels(a, b, flags=Flag.CONTINUE)
    stop = compare_voxels(a, b, flags=Flag.ZERO)
    assert cont.voxels_failed > stop.voxels_failed  # stopped at the first error
    errors = [m for s, m in stop.messages if s >= Severity.ERROR]
    assert len(errors) == 1


def test_compare_voxel_single_entry():
    a = build_map()
    b = copy.deepcopy(a)
    occ_idx = a.layout.layer_index("occupancy")
    region_key = next(iter(a.chunks))
    vidx = 5
    # voxel_index is x + dims.x*(y + dims.y*z); build local from that shape.
    dims = a.region_voxel_dims
    local = (vidx % dims[0], (vidx // dims[0]) % dims[1], vidx // (dims[0] * dims[1]))
    key = (region_key, local)
    assert compare_voxel(a, b, key)
    b.chunks[region_key].layers[occ_idx][OCCUPANCY_LAYER][vidx] = 77.0
    assert not compare_voxel(a, b, key)
    # Neighbouring voxel still matches.
    local2 = ((vidx + 1) % dims[0], ((vidx + 1) // dims[0]) % dims[1],
              (vidx + 1) // (dims[0] * dims[1]))
    assert compare_voxel(a, b, (region_key, local2))


def test_member_missing_from_test_map_fails_layer():
    a = build_map(flags=MapFlag.NONE)
    b = build_map(flags=MapFlag.NONE)
    occ_idx = b.layout.layer_index("occupancy")
    for chunk in b.chunks.values():
        chunk.layers[occ_idx] = np.zeros(
            chunk.layers[occ_idx].shape, dtype=np.dtype([("other", np.float32)]))
    result = compare_voxels(a, b, layers=["occupancy"])
    assert not result.ok
    assert any("missing from test map" in msg for _, msg in result.messages)
