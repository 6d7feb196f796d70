"""Serialisation tests (reference analogue: tests/ohmtest/SerialisationTests.cpp).

Round-trip pinning of the current format plus upgrade-loading of the
reference's committed old-format maps (read in place from the reference
checkout when available, mirroring the reference's own upgrade tests
against tests/data/test-map.0*.ohm).
"""

import os

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import OCCUPANCY_LAYER, MEAN_LAYER
from ohm_tpu.oracle.occupancy import RayMapperOccupancy
from ohm_tpu.io import save, load, load_header, SerialisationError

REFERENCE_DATA = "/root/reference/tests/data"


def build_test_map(flags=MapFlag.VOXEL_MEAN | MapFlag.TRAVERSAL):
    m = OccupancyMap(resolution=0.25, flags=flags, origin=(0.1, -0.2, 0.3))
    rng = np.random.default_rng(99)
    n = 60
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = np.empty((2 * n, 3))
    rays[0::2] = 0.0
    rays[1::2] = dirs * rng.uniform(1.0, 8.0, (n, 1))
    RayMapperOccupancy(m).integrate_rays(rays, timestamps=np.linspace(10.0, 11.0, n))
    m.info["creator"] = "ohm_tpu test"
    m.info["rays"] = n
    m.info["real"] = 0.5
    m.info["flag"] = True
    return m


def maps_equal(a, b):
    assert a.resolution == b.resolution
    assert np.array_equal(a.region_voxel_dims, b.region_voxel_dims)
    np.testing.assert_allclose(a.origin, b.origin)
    assert np.float32(a.hit_value) == np.float32(b.hit_value)
    assert np.float32(a.miss_value) == np.float32(b.miss_value)
    assert a.stamp == b.stamp
    assert a.first_ray_time == b.first_ray_time
    assert len(a.chunks) == len(b.chunks)
    assert len(a.layout) == len(b.layout)
    for la, lb in zip(a.layout, b.layout):
        assert la.name == lb.name
        assert la.voxel_layout.equals(lb.voxel_layout)
    for key, ca in a.chunks.items():
        cb = b.chunks.get(key)
        assert cb is not None, f"missing chunk {key}"
        np.testing.assert_allclose(ca.centre, cb.centre)
        for i in range(len(a.layout)):
            assert ca.layers[i].tobytes() == cb.layers[i].tobytes(), (
                f"layer {a.layout.layers[i].name} bytes differ in chunk {key}"
            )


def test_round_trip(tmp_path):
    m = build_test_map()
    path = str(tmp_path / "map.ohm")
    save(path, m)
    loaded, version = load(path)
    assert version == (0, 5, 0)
    maps_equal(m, loaded)
    # MapInfo round trip (values come back as typed MapValue).
    assert loaded.info["creator"].value == "ohm_tpu test"
    assert loaded.info["rays"].value == 60
    assert loaded.info["flag"].value is True


def test_round_trip_byte_stable(tmp_path):
    # Saving the same map twice must produce identical bytes; saving a loaded
    # map must reproduce the original file (full codec fidelity).
    m = build_test_map()
    p1 = str(tmp_path / "a.ohm")
    p2 = str(tmp_path / "b.ohm")
    save(p1, m)
    loaded, _ = load(p1)
    save(p2, loaded)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()


def test_load_header_only(tmp_path):
    m = build_test_map()
    path = str(tmp_path / "map.ohm")
    save(path, m)
    header, version, layout, info = load_header(path)
    assert header["region_count"] == len(m.chunks)
    assert header["resolution"] == m.resolution
    assert [l.name for l in layout] == [l.name for l in m.layout]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference checkout unavailable")
@pytest.mark.parametrize("name,version", [
    ("test-map.0.ohm", (0, 0, 0)),
    ("test-map.0.1.0.ohm", (0, 1, 0)),
    ("test-map.0.2.0.ohm", (0, 2, 0)),
    ("test-map.0.4.0.ohm", (0, 4, 0)),
])
def test_load_reference_maps(name, version):
    """Upgrade-load maps written by the reference C++ implementation."""
    m, v = load(os.path.join(REFERENCE_DATA, name))
    assert v == version
    assert len(m.chunks) > 0
    occ_idx = m.layer_index(OCCUPANCY_LAYER)
    assert occ_idx >= 0
    # The reference test map is a small populated scene: it must contain
    # both occupied and free voxels.
    occupied = free = 0
    for chunk in m:
        occ = chunk.layers[occ_idx][OCCUPANCY_LAYER]
        finite = occ[np.isfinite(occ)]
        occupied += int((finite >= m.occupancy_threshold_value).sum())
        free += int((finite < m.occupancy_threshold_value).sum())
    assert occupied > 0
    assert free > 0


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference checkout unavailable")
def test_load_header_v0_synthesises_layout():
    # v0 files carry no layout section; load_header must synthesise the
    # occupancy+clearance default rather than misreading chunk bytes
    # (reference: ohm/MapSerialise.cpp:744-752).
    header, version, layout, info = load_header(os.path.join(REFERENCE_DATA, "test-map.0.ohm"))
    assert version == (0, 0, 0)
    assert header["region_count"] > 0
    assert [l.name for l in layout] == ["occupancy", "clearance"]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference checkout unavailable")
def test_reference_map_round_trip_via_v05():
    """Load a reference-written map and re-save in v0.5; reload must match."""
    m, _ = load(os.path.join(REFERENCE_DATA, "test-map.0.4.0.ohm"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "resaved.ohm")
        save(path, m)
        again, v = load(path)
        assert v == (0, 5, 0)
        maps_equal(m, again)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference checkout unavailable")
def test_deprecated_v03_rejected():
    with pytest.raises(SerialisationError):
        load(os.path.join(REFERENCE_DATA, "test-map.0.3.0.ohm"))
