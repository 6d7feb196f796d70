"""PCD codec (io.pcd) round-trips and LZF stream tests.

Reference parity target: PDAL-breadth ingestion
(/root/reference/slamio/PointCloudReaderPdal.cpp) — PCD is implemented
natively here.
"""

import numpy as np
import pytest

from ohm_tpu.io.pcd import read_pcd, write_pcd, lzf_compress, lzf_decompress
from ohm_tpu.io.slam import load_cloud


def _cloud(n=257, seed=3):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "intensity": rng.uniform(0, 255, n).astype(np.float32),
        "time": (1_000_000 + np.arange(n) * 1e-4).astype(np.float64),
    }


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_pcd_round_trip(tmp_path, mode):
    fields = _cloud()
    path = str(tmp_path / f"rt_{mode}.pcd")
    write_pcd(path, fields, mode=mode)
    out = read_pcd(path)
    pts = np.column_stack([fields["x"], fields["y"], fields["z"]])
    np.testing.assert_allclose(out["points"], pts, rtol=0, atol=0)
    np.testing.assert_array_equal(out["intensities"], fields["intensity"])
    np.testing.assert_array_equal(out["timestamps"], fields["time"])


def test_pcd_nan_points_filtered(tmp_path):
    fields = _cloud(16)
    fields["x"][3] = np.nan  # PCL marks invalid points with NaN coords
    path = str(tmp_path / "nan.pcd")
    write_pcd(path, fields, mode="binary")
    out = read_pcd(path)
    assert out["points"].shape == (15, 3)
    assert np.isfinite(out["points"]).all()
    assert out["intensities"].shape == (15,)


def test_lzf_round_trip_random_and_repetitive():
    rng = np.random.default_rng(11)
    for data in (
        rng.integers(0, 256, 10000, dtype=np.uint8).tobytes(),  # incompressible
        b"abcabcabcabc" * 500,                                    # short cycle (overlap copies)
        np.zeros(4096, np.uint8).tobytes(),                       # constant
        rng.integers(0, 4, 5000, dtype=np.uint8).tobytes(),       # low entropy
        b"",                                                      # empty
        b"xy",                                                    # below match length
    ):
        comp = lzf_compress(data)
        assert lzf_decompress(comp, len(data)) == data
    # compressible data actually compresses
    assert len(lzf_compress(np.zeros(4096, np.uint8).tobytes())) < 200


def test_lzf_long_offset_and_length():
    # Exercise offsets > 255 (high offset bits) and max-length matches.
    block = bytes(range(256)) * 2
    data = block + b"\x00" * 300 + block
    comp = lzf_compress(data)
    assert lzf_decompress(comp, len(data)) == data


def test_slamio_reads_pcd(tmp_path):
    fields = _cloud(64)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, fields, mode="binary_compressed")
    out = load_cloud(path)
    assert out["points"].shape == (64, 3)
    assert "timestamps" in out and "intensities" in out
    assert "fields" not in out  # registry normalises the dict


def test_pcd_binary_compressed_count_field_interleaved(tmp_path):
    """PCL's binary_compressed SoA stores a COUNT>1 field's values
    interleaved per point within that field's chunk — regression for the
    reader treating each sub-field as its own contiguous column."""
    n = 5
    x = np.arange(n, dtype=np.float32)
    y = x + 10
    z = x + 20
    mom = np.arange(n * 3, dtype=np.float32).reshape(n, 3)  # [p, c] layout
    raw = b"".join([mom.tobytes(),  # COUNT=3 field FIRST (stresses offsets)
                    x.tobytes(), y.tobytes(), z.tobytes()])
    comp = lzf_compress(raw)
    path = str(tmp_path / "count.pcd")
    with open(path, "wb") as f:
        f.write((
            "VERSION 0.7\nFIELDS moment x y z\nSIZE 4 4 4 4\nTYPE F F F F\n"
            f"COUNT 3 1 1 1\nWIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA binary_compressed\n").encode())
        f.write(np.asarray([len(comp), len(raw)], "<u4").tobytes())
        f.write(comp)
    out = read_pcd(path)
    np.testing.assert_array_equal(out["points"],
                                  np.column_stack([x, y, z]).astype(np.float64))
    for c in range(3):
        np.testing.assert_array_equal(out["fields"][f"moment_{c}"], mom[:, c])


def test_pcd_with_normals_and_padding(tmp_path):
    # Hand-written header with a COUNT>1 field and '_' padding, ascii mode.
    path = str(tmp_path / "hand.pcd")
    with open(path, "w") as f:
        f.write(
            "VERSION 0.7\n"
            "FIELDS x y z normal_x normal_y normal_z _\n"
            "SIZE 4 4 4 4 4 4 1\n"
            "TYPE F F F F F F U\n"
            "COUNT 1 1 1 1 1 1 1\n"
            "WIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n"
            "DATA ascii\n"
            "0.5 1.5 2.5 0 0 1 0\n"
            "1.0 2.0 3.0 0 1 0 0\n")
    out = read_pcd(path)
    np.testing.assert_allclose(out["points"], [[0.5, 1.5, 2.5], [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(out["normals"], [[0, 0, 1], [0, 1, 0]])
