"""Real PNG decode (ext/multimodal.py _parse_png): round-trips against
a reference encoder exercising every scanline filter type, all
supported color types, and the Spark mapInPandas feature path."""

import struct
import zlib

import numpy as np
import pytest

from bq_duckdb_spark.ext import multimodal


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def encode_png(px: np.ndarray, ctype: int, filters=None, plte=None) -> bytes:
    """Reference encoder: filters each scanline with the REQUESTED
    filter type (default 0) — the forward transform, independent of the
    decoder's inverse."""
    h, w, nch = px.shape if px.ndim == 3 else (*px.shape, 1)
    px = px.reshape(h, w, nch).astype(np.int32)
    stride = w * nch
    flat = px.reshape(h, stride)
    filters = filters or [0] * h
    out_rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, cur = filters[y], flat[y]
        if f == 0:
            filt = cur % 256
        elif f == 1:
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f in (3, 4):
            filt = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                pred = (a + b) // 2 if f == 3 else _paeth(a, b, c)
                filt[x] = (cur[x] - pred) % 256
        out_rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    body += _chunk(b"IDAT", zlib.compress(b"".join(out_rows)))
    body += _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _random_px(h, w, nch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, nch), dtype=np.uint8).astype(np.uint8)


@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_all_filters(ctype, nch):
    px = _random_px(10, 7, nch, seed=ctype)
    # one row per filter type, then cycle — every decoder branch runs
    filters = [(i % 5) for i in range(10)]
    got = multimodal._parse_png(encode_png(px, ctype, filters))
    assert got.shape == (10, 7, nch)
    assert np.array_equal(got, px)


def test_palette_png():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 16, size=(6, 5, 1), dtype=np.uint8).astype(np.uint8)
    plte = rng.randint(0, 256, size=(16, 3), dtype=np.uint8).astype(np.uint8)
    got = multimodal._parse_png(encode_png(idx, 3, plte=plte))
    assert got.shape == (6, 5, 3)
    assert np.array_equal(got, plte[idx[:, :, 0]])


def test_gradient_smoke():
    # structured (non-random) content through Sub/Up/Paeth filtering
    y, x = np.mgrid[0:16, 0:16]
    px = np.stack([(y * 16) % 256, (x * 16) % 256, ((x + y) * 8) % 256], axis=-1)
    px = px.astype(np.uint8)
    blob = encode_png(px, 2, filters=[4, 3, 1, 2] * 4)
    assert np.array_equal(multimodal._parse_png(blob), px)


def test_interlaced_raises():
    px = _random_px(4, 4, 3, seed=9)
    blob = bytearray(encode_png(px, 2))
    # flip the IHDR interlace byte (last byte of the 13-byte IHDR body)
    ihdr_off = 8 + 8  # sig + len/tag
    blob[ihdr_off + 12] = 1
    # restore CRC consistency is irrelevant — parser reads fields only
    with pytest.raises(NotImplementedError, match="interlace"):
        multimodal._parse_png(bytes(blob))


def test_feature_path_real_decode(spark):
    px = _random_px(8, 8, 3, seed=5)
    blob = encode_png(px, 2, filters=[0, 1, 2, 3, 4, 0, 1, 2])
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/png")],
        "blob_id long, payload binary, media_type string",
    )
    feats = multimodal.extract_features(df, decode_stub=False).collect()[0]
    expect = multimodal._image_features(px, 255)
    assert feats.feature == pytest.approx(expect)


def test_resize_png_normalizes_to_netpbm(spark):
    """resize_images accepts PNG input and emits a normalized netpbm
    payload whose pixels match resizing the decoded array directly."""
    import numpy as np

    px = _random_px(16, 12, 3, seed=8)
    blob = encode_png(px, 2, filters=[1, 2, 4, 3] * 4)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/png")],
        "blob_id long, payload binary, media_type string",
    )
    out = multimodal.resize_images(df, width=6, height=8, decode_stub=False).collect()[0]
    got, maxval = multimodal._parse_netpbm(bytes(out.payload))
    assert got.shape == (8, 6, 3) and maxval == 255
    rows = np.minimum((np.arange(8) * 16) // 8, 15)
    cols = np.minimum((np.arange(6) * 12) // 6, 11)
    assert np.array_equal(got, px[rows[:, None], cols[None, :], :])


def test_resize_rgba_drops_alpha(spark):
    px = _random_px(4, 4, 4, seed=9)
    blob = encode_png(px, 6)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/png")],
        "blob_id long, payload binary, media_type string",
    )
    out = multimodal.resize_images(df, width=4, height=4, decode_stub=False).collect()[0]
    got, _ = multimodal._parse_netpbm(bytes(out.payload))
    assert got.shape == (4, 4, 3)
    import numpy as np

    assert np.array_equal(got, px[:, :, :3])
