"""Native LAS point-cloud reader (pure numpy, no external dependencies).

Reference parity: slamio/PointCloudReaderPdal.{h,cpp} reads LAS/LAZ (among
other formats) through PDAL; PDAL is not available in this environment, so
.las is parsed directly against the public ASPRS LAS 1.0-1.4 specification.
Compressed .laz still requires laspy+lazrs when importable (the LAZ codec is
out of scope for a from-scratch reader); io.slam gates it.

Covers point data record formats 0-10: scaled XYZ, intensity, GPS time,
return number / number of returns (dual-return detection for the
secondary-samples mapper — reference slamio/SlamCloudLoader.h dual return
handling).
"""

from __future__ import annotations

import numpy as np

#: GPS-time byte offset within a point record, per point data format id.
_GPS_OFFSET = {1: 20, 3: 20, 4: 20, 5: 20, 6: 22, 7: 22, 8: 22, 9: 22, 10: 22}
#: Formats whose return info lives in byte 14 as two 4-bit fields (1.4 era).
_EXTENDED_RETURNS = {6, 7, 8, 9, 10}


def read_las(filename: str) -> dict:
    """Parse a .las file; returns dict with 'points' f64[N,3] and, when
    present in the format, 'timestamps' f64[N], 'intensities' f32[N],
    'return_numbers' u8[N], 'number_of_returns' u8[N]."""
    with open(filename, "rb") as f:
        header = f.read(375)
        if len(header) < 227 or header[0:4] != b"LASF":
            raise ValueError(f"{filename}: not a LAS file (missing LASF signature)")
        ver_major, ver_minor = header[24], header[25]
        point_offset = int(np.frombuffer(header, "<u4", 1, 96)[0])
        fmt = header[104]
        if fmt & 0x80:
            raise ValueError(
                f"{filename}: compressed LAZ data (format bit 7 set) — "
                "decompress or install laspy+lazrs")
        if fmt > 10:
            raise ValueError(f"{filename}: unsupported point data format {fmt}")
        rec_len = int(np.frombuffer(header, "<u2", 1, 105)[0])
        n_points = int(np.frombuffer(header, "<u4", 1, 107)[0])
        if n_points == 0 and ver_major == 1 and ver_minor >= 4 and len(header) >= 255:
            n_points = int(np.frombuffer(header, "<u8", 1, 247)[0])
        scale = np.frombuffer(header, "<f8", 3, 131).copy()
        offset = np.frombuffer(header, "<f8", 3, 155).copy()

        f.seek(point_offset)
        raw = f.read(n_points * rec_len)
    if len(raw) < n_points * rec_len:
        n_points = len(raw) // rec_len
        raw = raw[: n_points * rec_len]
    rec = np.frombuffer(raw, np.uint8).reshape(n_points, rec_len)

    def field(off, dtype, count=1):
        width = np.dtype(dtype).itemsize * count
        block = np.ascontiguousarray(rec[:, off:off + width])
        arr = block.view(dtype)
        return arr[:, 0] if count == 1 else arr

    xyz_i = field(0, "<i4", 3).astype(np.float64)
    out = {"points": xyz_i * scale[None, :] + offset[None, :]}
    if rec_len >= 14:
        out["intensities"] = field(12, "<u2").astype(np.float32)
    gps_off = _GPS_OFFSET.get(int(fmt))
    if gps_off is not None and rec_len >= gps_off + 8:
        out["timestamps"] = field(gps_off, "<f8").astype(np.float64)
    if fmt in _EXTENDED_RETURNS:
        rb = rec[:, 14]
        out["return_numbers"] = (rb & 0x0F).astype(np.uint8)
        out["number_of_returns"] = (rb >> 4).astype(np.uint8)
    else:
        rb = rec[:, 14]
        out["return_numbers"] = (rb & 0x07).astype(np.uint8)
        out["number_of_returns"] = ((rb >> 3) & 0x07).astype(np.uint8)
    return out


def write_las(filename: str, points, timestamps=None, intensities=None,
              return_numbers=None, number_of_returns=None,
              scale=(1e-3, 1e-3, 1e-3)) -> None:
    """Write a minimal LAS 1.2 file (format 1: XYZ + intensity + GPS time).

    Primarily for tests and ohmfilter/ohm2ply-style export round-trips."""
    points = np.asarray(points, np.float64).reshape(-1, 3)
    n = len(points)
    scale = np.asarray(scale, np.float64)
    offset = points.min(axis=0) if n else np.zeros(3)
    rec_len = 28  # format 1
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 2
    header[94:96] = int(227).to_bytes(2, "little")  # header size
    header[96:100] = int(227).to_bytes(4, "little")  # point data offset
    header[104] = 1
    header[105:107] = rec_len.to_bytes(2, "little")
    header[107:111] = n.to_bytes(4, "little")
    header[131:155] = scale.tobytes()
    header[155:179] = offset.tobytes()
    if n:
        header[179:227] = np.concatenate(
            [points.max(axis=0), points.min(axis=0)])[[0, 3, 1, 4, 2, 5]].tobytes()

    rec = np.zeros((n, rec_len), np.uint8)
    xyz_i = np.round((points - offset[None, :]) / scale[None, :]).astype("<i4")
    rec[:, 0:12] = np.ascontiguousarray(xyz_i).view(np.uint8).reshape(n, 12)
    if intensities is not None:
        rec[:, 12:14] = np.asarray(intensities, "<u2").view(np.uint8).reshape(n, 2)
    rn = np.asarray(return_numbers, np.uint8) if return_numbers is not None else np.ones(n, np.uint8)
    nr = np.asarray(number_of_returns, np.uint8) if number_of_returns is not None else np.ones(n, np.uint8)
    rec[:, 14] = (rn & 0x07) | ((nr & 0x07) << 3)
    if timestamps is not None:
        rec[:, 20:28] = np.asarray(timestamps, "<f8").view(np.uint8).reshape(n, 8)
    with open(filename, "wb") as f:
        f.write(bytes(header))
        f.write(rec.tobytes())
