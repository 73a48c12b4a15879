"""Real GIF decode (ext/multimodal.py _parse_gif): round-trips against
two independent reference encoders — a clear-code-per-symbol stream
(no dictionary use at all) and a true LZW compressor (dictionary
growth + width bumps + the KwKwK case) — plus interlace and extension
handling."""

import struct

import numpy as np
import pytest

from bq_duckdb_spark.ext import multimodal


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, code: int, width: int):
        for i in range(width):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _lzw_trivial(indices, min_code):
    """Clear code before every symbol: never grows the dictionary."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _BitWriter()
    width = min_code + 1
    for s in indices:
        w.write(clear, width)
        w.write(int(s), width)
    w.write(end, width)
    return w.bytes()


def _lzw_real(indices, min_code):
    """Textbook GIF LZW: dictionary growth and width bumps."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    w = _BitWriter()
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, width)
    seq = ()
    for s in indices:
        s = int(s)
        if seq + (s,) in table:
            seq = seq + (s,)
            continue
        w.write(table[seq], width)
        table[seq + (s,)] = next_code
        next_code += 1
        # GIF encoders bump width when next_code EXCEEDS the width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        seq = (s,)
    if seq:
        w.write(table[seq], width)
    w.write(end, width)
    return w.bytes()


def encode_gif(px_idx, palette, encoder, interlace=False, with_ext=False):
    h, w = px_idx.shape
    n = len(palette)
    size_field = max((n - 1).bit_length() - 1, 0)
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes([r, g, b])
    gct += b"\x00" * ((2 << size_field) * 3 - len(gct))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += gct
    if with_ext:  # graphic-control extension, must be skipped cleanly
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = px_idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = px_idx[order]
    min_code = max(size_field + 1, 2)
    data = encoder(rows.reshape(-1), min_code)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(data), 200):
        chunk = data[i : i + 200]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _random_frame(h, w, ncolors, seed):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, ncolors, size=(h, w)).astype(np.uint8)
    palette = [tuple(rng.randint(0, 256, 3)) for _ in range(ncolors)]
    return idx, palette


@pytest.mark.parametrize("encoder", [_lzw_trivial, _lzw_real])
def test_roundtrip(encoder):
    idx, palette = _random_frame(13, 9, 8, seed=1)
    got = multimodal._parse_gif(encode_gif(idx, palette, encoder))
    assert got.shape == (13, 9, 3)
    expect = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(got, expect)


def test_kwkwk_case():
    # 'aaaa...' forces the code == next_code branch immediately
    idx = np.zeros((4, 4), dtype=np.uint8)
    palette = [(10, 20, 30), (0, 0, 0)]
    got = multimodal._parse_gif(encode_gif(idx, palette, _lzw_real))
    assert np.array_equal(got, np.tile(np.array([10, 20, 30], np.uint8), (4, 4, 1)))


def test_interlaced_and_extension():
    idx, palette = _random_frame(16, 5, 4, seed=3)
    blob = encode_gif(idx, palette, _lzw_real, interlace=True, with_ext=True)
    got = multimodal._parse_gif(blob)
    assert np.array_equal(got, np.array(palette, np.uint8)[idx])


def test_width_growth_long_stream():
    # enough distinct phrases to force several width bumps (3 -> 8 bits)
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 4, size=(40, 40)).astype(np.uint8)
    palette = [tuple(rng.randint(0, 256, 3)) for _ in range(4)]
    got = multimodal._parse_gif(encode_gif(idx, palette, _lzw_real))
    assert np.array_equal(got, np.array(palette, np.uint8)[idx])


def test_feature_path(spark):
    idx, palette = _random_frame(8, 8, 8, seed=5)
    blob = encode_gif(idx, palette, _lzw_real)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/gif")],
        "blob_id long, payload binary, media_type string",
    )
    feats = multimodal.extract_features(df, decode_stub=False).collect()[0]
    expect = multimodal._image_features(np.array(palette, np.uint8)[idx], 255)
    assert feats.feature == pytest.approx(expect)


def test_corrupt_first_code_uniform_error():
    # first code after (implicit) clear that is not a root entry must
    # raise the same ValueError as mid-stream corruption, not KeyError
    # (codes are 3 bits here: roots 0..3, clear=4, end=5, next=6)
    with pytest.raises(ValueError, match="corrupt GIF LZW"):
        multimodal._gif_lzw_decode(bytes([0b111]), 2)  # code 7: out of range
    with pytest.raises(ValueError, match="corrupt GIF LZW"):
        multimodal._gif_lzw_decode(bytes([0b110]), 2)  # code 6: KwKwK needs prev
