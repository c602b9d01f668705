"""Baseline JPEG codec + TIFF compression-7 integration.

The reference reads JPEG GeoTIFFs through GDAL/libjpeg
(``/root/reference/homonim/raster_array.py:129-199``); the engine carries
its own pure-numpy baseline codec (``homonim_spark/jpegio.py``).  Covers:
codec round trips (q=100 near-lossless bound, constant exact), restart
intervals, abbreviated JPEGTables streams, 4:2:0 subsampling, YCbCr, the
TIFF read/write integration through BOTH the whole-file and windowed
paths, and an external-style fixture (JPEGTables tag 347 + photometric 6)
that the engine's own writer never produces.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from homonim_spark.jpegio import (decode_jpeg, encode_jpeg,
                                  jpeg_tables_stream, rgb_to_ycc,
                                  ycc_to_rgb)
from homonim_spark.tiffio import (decode_window, read_gtiff,
                                  read_gtiff_meta, write_gtiff)


def _wave(h, w, scale=90, offset=130):
    return (np.sin(np.linspace(0, 8, h))[:, None]
            * np.cos(np.linspace(0, 6, w))[None, :] * scale
            + offset).astype(np.uint8)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def test_constant_image_is_exact():
    img = np.full((40, 56), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_q100_is_near_lossless():
    """All-ones quant tables (IJG quality 100): error is only FDCT/IDCT
    float rounding — bounded by 1 count."""
    img = _wave(96, 96)
    out = decode_jpeg(encode_jpeg(img, quality=100))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    noise = np.random.default_rng(0).integers(0, 256, (64, 64), np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))[:, :, 0]
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 1


def test_quality_scaling_monotone():
    img = _wave(64, 64)
    errs = []
    for q in (100, 90, 50):
        out = decode_jpeg(encode_jpeg(img, quality=q))[:, :, 0]
        errs.append(np.abs(out.astype(float) - img.astype(float)).mean())
    assert errs[0] <= errs[1] <= errs[2]
    assert errs[2] < 10  # Annex K tables on a smooth image stay close


def test_restart_intervals_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    s = encode_jpeg(img, quality=100, restart_interval=5)
    assert b"\xff\xd0" in s or b"\xff\xd1" in s  # RST markers present
    out = decode_jpeg(s)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_abbreviated_jpegtables_streams_decode_identically():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    full = decode_jpeg(encode_jpeg(img, quality=95))
    abbrev = decode_jpeg(encode_jpeg(img, quality=95, omit_tables=True),
                         tables=jpeg_tables_stream(quality=95))
    np.testing.assert_array_equal(full, abbrev)


def test_420_subsampled_ycc_roundtrip_smooth():
    """4:2:0: chroma at half resolution — on blockwise-smooth data the
    round trip stays within a tight tolerance (replication upsampling)."""
    rng = np.random.default_rng(3)
    base = np.repeat(np.repeat(rng.integers(40, 200, (8, 8)), 8, 0), 8, 1)
    rgb = np.stack([base, base // 2 + 30, base // 3 + 60],
                   axis=-1).astype(np.uint8)
    ycc = rgb_to_ycc(rgb)
    out = decode_jpeg(encode_jpeg(ycc, quality=95, subsample=True))
    assert out.shape == ycc.shape
    back = ycc_to_rgb(out)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 12


def test_unsupported_modes_raise():
    img = np.zeros((16, 16), dtype=np.uint8)
    s = bytearray(encode_jpeg(img))
    i = s.find(b"\xff\xc0")
    s[i + 1] = 0xC2                      # rewrite SOF0 -> SOF2 progressive
    with pytest.raises(ValueError, match="SOF marker 0xc2"):
        decode_jpeg(bytes(s))
    with pytest.raises(ValueError, match="8-bit"):
        # 12-bit precision byte in SOF
        s[i + 1] = 0xC0
        s[i + 4] = 12
        decode_jpeg(bytes(s))
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint16))


# ---------------------------------------------------------------------------
# TIFF integration
# ---------------------------------------------------------------------------

def test_jpeg_tiff_tiled_whole_and_windowed(tmp_path):
    img = _wave(300, 280)
    path = str(tmp_path / "j.tif")
    write_gtiff(path, img, tile=(64, 64), compress="jpeg", jpeg_quality=100,
                transform=(2, 0, 0, 0, -2, 600), epsg=32633)
    g = read_gtiff(path)
    assert np.abs(g.data[0].astype(int) - img.astype(int)).max() <= 1
    assert g.crs == "EPSG:32633"
    meta = read_gtiff_meta(path)
    assert meta.comp == 7
    # windowed decode is bit-identical to the whole-file decode
    for y0, y1 in [(0, 64), (50, 200), (250, 300)]:
        np.testing.assert_array_equal(decode_window(path, meta, y0, y1)[0],
                                      g.data[0][y0:y1])


def test_jpeg_tiff_stripped_rgb(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (3, 100, 120), dtype=np.uint8)
    path = str(tmp_path / "j3.tif")
    write_gtiff(path, img, rows_per_strip=16, compress="jpeg",
                jpeg_quality=100)
    g = read_gtiff(path)
    assert np.abs(g.data.astype(int) - img.astype(int)).max() <= 1
    meta = read_gtiff_meta(path)
    np.testing.assert_array_equal(decode_window(path, meta, 10, 90),
                                  g.data[:, 10:90])


def test_jpeg_tiff_overview_chain(tmp_path):
    """JPEG compression composes with the overview IFD chain."""
    from homonim_spark.tiffio import build_overviews
    img = _wave(600, 520)[None]
    ovs = build_overviews(img, min_level_pixels=64)
    path = str(tmp_path / "jo.tif")
    write_gtiff(path, img, tile=(64, 64), compress="jpeg", jpeg_quality=100,
                overviews=ovs)
    g = read_gtiff(path)
    assert g.n_overviews == len(ovs) == 3
    lv1 = read_gtiff(path, ifd=1)
    assert np.abs(lv1.data.astype(int) - ovs[0].astype(int)).max() <= 1


def test_jpeg_write_validation(tmp_path):
    with pytest.raises(ValueError, match="uint8"):
        write_gtiff(str(tmp_path / "x.tif"),
                    np.zeros((8, 8), np.float32), compress="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        write_gtiff(str(tmp_path / "x.tif"),
                    np.zeros((8, 8), np.uint8), compress="jpeg", predictor=2)


def _external_style_jpeg_tiff(path: str, rgb: np.ndarray, quality: int = 95):
    """Hand-assemble the TIFF layout GDAL emits for JPEG: ONE strip whose
    stream is abbreviated (no DQT/DHT), tables factored into the JPEGTables
    tag (347), photometric 6 (YCbCr) with 4:2:0 subsampled chroma — a shape
    the engine's own writer never produces, proving external-file reads."""
    h, w, _ = rgb.shape
    ycc = rgb_to_ycc(rgb)
    tables = jpeg_tables_stream(quality=quality, chroma=True)
    scan = encode_jpeg(ycc, quality=quality, subsample=True,
                       omit_tables=True)
    entries = [  # (tag, type, values)
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]), (278, 4, [h]), (284, 3, [1]),
        (339, 3, [1, 1, 1]),
        (530, 3, [2, 2]),                      # YCbCrSubSampling 4:2:0
    ]
    n = len(entries) + 3                       # + offsets, counts, 347
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    extra = bytearray()
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n)
    fmt = {3: "H", 4: "I"}

    # out-of-line tag data directly after the IFD; the strip after that
    blobs = []
    for tag, typ, vals in entries:
        blob = struct.pack("<" + str(len(vals)) + fmt[typ], *vals)
        blobs.append((tag, typ, len(vals), blob))
    blobs.append((347, 7, len(tables), bytes(tables)))
    strip_off = data_off + sum(len(b) for _, _, _, b in blobs if len(b) > 4)
    blobs.append((273, 4, 1, struct.pack("<I", strip_off)))
    blobs.append((279, 4, 1, struct.pack("<I", len(scan))))
    blobs.sort(key=lambda b: b[0])
    extra_pos = data_off
    for tag, typ, cnt, blob in blobs:
        out += struct.pack("<HHI", tag, typ, cnt)
        if len(blob) <= 4:
            out += blob.ljust(4, b"\0")
        else:
            out += struct.pack("<I", extra_pos)
            extra += blob
            extra_pos += len(blob)
    out += struct.pack("<I", 0)
    assert len(out) == data_off
    out += extra
    assert len(out) == strip_off
    out += scan
    with open(path, "wb") as f:
        f.write(bytes(out))
    return ycc


def test_external_jpegtables_ycbcr_tiff(tmp_path):
    """Read the GDAL-style layout: abbreviated per-strip streams + tag 347
    + photometric 6 → the reader merges tables, decodes the subsampled
    YCbCr and presents RGB (like GDAL's JPEG driver)."""
    rng = np.random.default_rng(5)
    base = np.repeat(np.repeat(rng.integers(40, 200, (8, 10)), 8, 0), 8, 1)
    rgb = np.stack([base, base // 2 + 30, base // 3 + 60],
                   axis=-1).astype(np.uint8)
    path = str(tmp_path / "ext.tif")
    _external_style_jpeg_tiff(path, rgb)

    g = read_gtiff(path)
    assert g.data.shape == (3, 64, 80)
    got = g.data.transpose(1, 2, 0)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 16
    # windowed path: same merge + conversion
    meta = read_gtiff_meta(path)
    assert meta.comp == 7 and meta.photometric == 6
    assert meta.jpeg_tables is not None
    np.testing.assert_array_equal(decode_window(path, meta, 0, 64), g.data)


def test_multiscan_jpeg_raises_loudly():
    """ADVICE r05 #4: a sequential JPEG whose first SOS covers only some
    frame components must raise the module's explicit ValueError, not a
    bare KeyError from the coefficient table."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    s = bytearray(encode_jpeg(img))
    i = s.find(b"\xff\xda")
    assert i > 0
    # rewrite the 3-component SOS header to list ONE component (legal
    # syntax for a non-interleaved multi-scan stream)
    orig_len = int.from_bytes(s[i + 2: i + 4], "big")
    one = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,
                 0x00, 0x3F, 0x00])
    s2 = bytes(s[:i]) + one + bytes(s[i + 2 + orig_len:])
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(s2)


def test_jpeg_edge_tile_padding_no_ringing(tmp_path):
    """ADVICE r05 #3: JPEG edge tiles are padded by edge replication, so
    lossy DCT ringing from a synthetic 0-step no longer corrupts valid
    pixels inside tile-unaligned images."""
    from homonim_spark.tiffio import read_gtiff, write_gtiff
    # constant mid-gray image, 10px short of the tile grid in both dims
    img = np.full((1, 118, 86), 200, dtype=np.uint8)
    path = str(tmp_path / "edge.tif")
    write_gtiff(path, img, tile=(64, 64), compress="jpeg", jpeg_quality=85)
    got = read_gtiff(path).data
    # with edge replication a constant image stays (near-)constant right
    # up to the border; zero padding produced errors of tens of levels
    assert np.abs(got.astype(int) - 200).max() <= 2
