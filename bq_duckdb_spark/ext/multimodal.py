"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs via
``mapInPandas``.

Decode support is tiered:
- PPM/PGM (netpbm P5/P6) and uncompressed BMP images decode FOR REAL
  with numpy only — ``decode_stub=False`` works end to end for them
  (header parse, pixel array, channel-statistics features,
  nearest-neighbor resize for netpbm).
- WAV/PCM audio (RIFF, 8/16/32-bit integer PCM) decodes FOR REAL too:
  chunk walk, normalized sample matrix, amplitude/zero-crossing stats.
- YUV4MPEG2 (.y4m) uncompressed video parses FOR REAL (stdlib header +
  frame walk): true frame sampling in sample_frames and luma/motion
  features in extract_features.
- PNG decodes FOR REAL with stdlib zlib + numpy (public spec): chunk
  walk, IDAT inflate, all five scanline filters (None/Sub/Up/Average/
  Paeth) unapplied, 8-bit gray / gray+alpha / RGB / RGBA / palette;
  Adam7 interlace raises.
- GIF87a/89a first frames decode FOR REAL: block walk, sub-block
  concatenation, variable-width LSB-first LZW (clear/end/KwKwK, width
  growth to 12 bits), color-table lookup, 4-pass deinterlace.
- JPEG/compressed audio/video need libs absent from this container
  (PIL, ffmpeg); those payloads raise ``NotImplementedError`` under
  ``decode_stub=False`` and use the deterministic byte-stats stub
  otherwise, so the Spark-side plumbing — schema, partitioning, UDF
  signature, Arrow batch shape — is exercised either way.

Scale design: blobs stay columnar in parquet; feature extraction is
``mapInPandas`` (one Arrow batch at a time, bounded memory per task);
repartition by size class before decode when blob sizes are skewed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def make_blob_table(df: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Build a multimodal blob table from any table with an id + payload
    source (here: text bytes stand in for encoded media).

    Rows with a NULL payload source are dropped: a blob IS its bytes, and
    a NULL payload would otherwise reach the Arrow batch as None and
    crash the feature extractor's len() (gen_fuzz finding)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("blob_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    ).where(F.col("payload").isNotNull())


def _parse_netpbm(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a binary netpbm image (P5 grayscale / P6 RGB) → (pixels as
    (h, w, channels) uint8 array, maxval). Pure numpy, no image libs."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace separated, with
    # optional '#' comment lines
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=pos)
    return raster.reshape(h, w, channels), maxval


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed (BI_RGB) 24/32-bit BMP → (h, w, channels)
    uint8 array in RGB(A) order. Pure stdlib struct + numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (got "
            f"compression={comp}, bpp={bpp})"
        )
    top_down, h = h < 0, abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]  # BMP default raster order is bottom-up
    order = [2, 1, 0] + ([3] if nch == 4 else [])  # BGR(A) → RGB(A)
    return px[:, :, order]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (palette expands to RGB after lookup)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(payload: bytes) -> np.ndarray:
    """Parse a PNG → (h, w, channels) uint8 array. Stdlib zlib + numpy
    only (public spec, RFC 2083): chunk walk, concatenated-IDAT
    inflate, scanline unfiltering. 8-bit depth, non-interlaced;
    grayscale / gray+alpha / RGB / RGBA / indexed (PLTE lookup)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} interlace={interlace}: "
            "only 8-bit non-interlaced gray/rgb/palette/alpha supported"
        )
    nch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * nch
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, line = int(filters[y]), rows[y]
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: left-cumulative per channel — vectorize as
            # cumsum mod 256 over pixels within each channel lane
            cur = line.reshape(w, nch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-dependency is
            # sequential by definition — per-pixel scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y], prev = cur, cur
    px = recon.astype(np.uint8).reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("indexed PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return px


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (variable code width 3..12 bits, LSB-first bit
    packing, clear/end codes) → palette indices. Pure Python over the
    concatenated sub-block bytes — GIF frames are small; heavy decode
    belongs to real media libs, this covers the interchange format."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = fresh()
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    next_code = end + 1
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = fresh()
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code not in table:
                    # first code after a clear must be a root entry —
                    # same uniform error as the mid-stream corrupt case
                    raise ValueError(f"corrupt GIF LZW stream (code {code})")
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _parse_gif(payload: bytes) -> np.ndarray:
    """Parse a GIF87a/89a first frame → (h, w, 3) uint8 RGB. Stdlib +
    numpy: logical-screen/color-table walk, extension skip, sub-block
    concatenation, LZW decode, optional 4-pass deinterlace."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _gif_lzw_decode(b"".join(chunks), min_code)[: w * h], np.uint8
            ).reshape(h, w)
            if iflags & 0x40:  # 4-pass interlace row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            return ct[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def _parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE integer-PCM payload → (samples as (n, channels)
    float64 in [-1, 1], sample_rate). Pure stdlib struct + numpy."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_fmt, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or bits not in (8, 16, 32) or nch == 0:
        raise NotImplementedError(
            f"only integer PCM WAV supported (got format={audio_fmt}, "
            f"bits={bits})"
        )
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    raw = np.frombuffer(data, dtype=dtype)
    raw = raw[: (len(raw) // nch) * nch].reshape(-1, nch)
    if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
        x = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        x = raw.astype(np.float64) / float(2 ** (bits - 1))
    return x, rate


def _parse_y4m(payload: bytes) -> tuple[int, int, str, list[bytes]]:
    """Parse a YUV4MPEG2 (.y4m) uncompressed video payload → (width,
    height, colorspace, frames as raw planar-YUV byte strings). Pure
    stdlib — Y4M is a public plain-header container (header line
    ``YUV4MPEG2 W.. H.. F.. [C..]``, then ``FRAME[params]\\n`` + raw
    planes per frame), so video frame access needs no ffmpeg."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    hdr_end = payload.index(b"\n")
    width = height = 0
    colorspace = "420"
    for tok in payload[9:hdr_end].split():
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:].decode("ascii")
    if width <= 0 or height <= 0:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("420"):
        frame_len = width * height + 2 * ((width // 2) * (height // 2))
    elif colorspace.startswith("422"):
        frame_len = width * height + 2 * ((width // 2) * height)
    elif colorspace.startswith("444"):
        frame_len = 3 * width * height
    elif colorspace.startswith("mono"):
        frame_len = width * height
    else:
        raise NotImplementedError(f"unsupported Y4M colorspace C{colorspace}")
    frames, pos = [], hdr_end + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt Y4M: expected FRAME marker at {pos}")
        data_start = payload.index(b"\n", pos) + 1  # skip optional frame params
        frames.append(payload[data_start : data_start + frame_len])
        pos = data_start + frame_len
    return width, height, colorspace, frames


def _frame_indices(n_frames: int, num_frames: int) -> list[int]:
    """Uniformly spaced frame indices (first and last always included
    when num_frames > 1), deterministic."""
    if n_frames <= 0:
        return []
    if n_frames == 1:
        return [0] * num_frames
    if num_frames == 1:
        return [0]
    return [
        min(round(i * (n_frames - 1) / (num_frames - 1)), n_frames - 1)
        for i in range(num_frames)
    ]


def _video_features(width: int, height: int, frames: list[bytes]) -> list[float]:
    """8-dim video features from the luma planes of up to 4 sampled
    frames: global luma mean/std, first-vs-last frame mean absolute
    difference (motion proxy), frame count, and shape stats."""
    n_luma = width * height
    sampled = [
        np.frombuffer(frames[i], dtype=np.uint8, count=n_luma).astype(np.float64)
        for i in _frame_indices(len(frames), min(4, len(frames)))
    ]
    luma = np.stack(sampled) / 255.0
    motion = float(np.abs(luma[-1] - luma[0]).mean()) if len(luma) > 1 else 0.0
    return [
        float(luma.mean()),
        float(luma.std()),
        motion,
        float(len(frames)),
        float(width),
        float(height),
        float(width / height),
        float(luma[0].mean()),
    ]


def _image_features(px: np.ndarray, maxval: int) -> list[float]:
    """Per-channel mean/std + shape stats — shared by netpbm and BMP."""
    h, w, c = px.shape
    scaled = px.astype(np.float64) / maxval
    means = [float(scaled[:, :, i % c].mean()) for i in range(3)]
    stds = [float(scaled[:, :, i % c].std()) for i in range(3)]
    return means + stds + [float(w) / h, float(c)]


def _audio_features(x: np.ndarray, rate: int) -> list[float]:
    """Amplitude/shape stats over the normalized sample matrix."""
    mono = x.mean(axis=1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    return [
        float(mono.mean()),
        float(mono.std()),
        float(np.sqrt(np.mean(mono**2))),  # RMS level
        float(np.abs(mono).max()) if len(mono) else 0.0,
        zc,  # zero-crossing rate
        float(len(mono)) / rate,  # duration (s)
        float(rate),
        float(x.shape[1]),
    ]


def _spectral_features(x: np.ndarray, rate: int) -> list[float]:
    """Frequency-domain descriptors of a decoded PCM signal — REAL DSP,
    pure ``numpy.fft`` (no librosa/scipy needed): the audio analogue of
    the image channel stats, the per-clip signal a curation pipeline
    filters on (silence/tone detection, bandwidth gating, speech-band
    energy).

    8-dim: [centroid_hz, bandwidth_hz, rolloff85_hz, flatness,
    dominant_hz, low<300Hz, speech 300-3400Hz, high>3400Hz band-energy
    ratios]. Flatness (geometric/arithmetic spectral mean) separates
    tones (→0) from noise (→1).
    """
    mono = x.mean(axis=1)
    n = len(mono)
    if n < 2:
        return [0.0] * 8
    spec = np.abs(np.fft.rfft(mono * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = spec.sum()
    if total <= 0.0:
        return [0.0] * 8
    p = spec / total
    centroid = float((freqs * p).sum())
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
    rolloff = float(freqs[np.searchsorted(np.cumsum(p), 0.85)])
    flatness = float(
        np.exp(np.mean(np.log(spec + 1e-12))) / (spec.mean() + 1e-12)
    )
    dominant = float(freqs[int(spec.argmax())])
    low = float(p[freqs < 300.0].sum())
    mid = float(p[(freqs >= 300.0) & (freqs <= 3400.0)].sum())
    high = float(p[freqs > 3400.0].sum())
    return [centroid, bandwidth, rolloff, flatness, dominant, low, mid, high]


def extract_spectral_features(blobs: DataFrame) -> DataFrame:
    """WAV blob table → spectral feature table (FEATURE_SCHEMA shape).

    Always a REAL decode (PCM WAV parses with stdlib+numpy; no stub
    path exists because none is needed); non-WAV payloads raise the
    same loud NotImplementedError as _decode_one's real path. Same
    mapInPandas batch shape as extract_features: bounded memory per
    task, decode parallelism = scan partitions, zero shuffles.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]

            def feat(b: bytes) -> list[float]:
                b = bytes(b)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise NotImplementedError(
                        "spectral features are defined for PCM WAV payloads"
                    )
                return _spectral_features(*_parse_wav(b))

            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: sum(b[:256]) % (2**31)
                    ).astype("int64"),
                    "feature": payloads.map(feat),
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)


def _decode_one(payload: bytes, decode_stub: bool) -> list[float]:
    """Decode a media payload into an 8-dim feature vector.

    Real path (``decode_stub=False``): netpbm P5/P6 and uncompressed
    BMP images decode with numpy (per-channel mean/std + shape stats);
    WAV/PCM audio decodes to amplitude/zero-crossing stats. Other
    formats need PIL/librosa/ffmpeg (absent here) and raise.
    Stub path: deterministic byte statistics, any payload.
    """
    if not decode_stub:
        if payload[:2] in (b"P5", b"P6"):
            px, maxval = _parse_netpbm(payload)
            return _image_features(px, maxval)
        if payload[:2] == b"BM":
            return _image_features(_parse_bmp(payload), 255)
        if payload[:8] == _PNG_SIG:
            return _image_features(_parse_png(payload), 255)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _image_features(_parse_gif(payload), 255)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _audio_features(*_parse_wav(payload))
        if payload[:9] == b"YUV4MPEG2":
            w, h, _, frames = _parse_y4m(payload)
            return _video_features(w, h, frames)
        raise NotImplementedError(
            "real decode beyond netpbm (P5/P6), uncompressed BMP, PNG, "
            "GIF, PCM WAV, and YUV4MPEG2 video requires media libraries "
            "not present in this environment; run with decode_stub=True"
        )
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    # deterministic byte statistics as the fake embedding
    step = max(n // 8, 1)
    return [float(sum(payload[i : i + step]) % 1009) / 1009.0 for i in range(0, min(n, 8 * step), step)][:8]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _decode_image(payload: bytes) -> tuple[np.ndarray, int]:
    """Any supported image payload → ((h, w, c) uint8 pixels, maxval).
    Alpha channels are dropped (resize/feature consumers are RGB/gray);
    unsupported formats raise NotImplementedError."""
    if payload[:2] in (b"P5", b"P6"):
        return _parse_netpbm(payload)
    if payload[:2] == b"BM":
        px = _parse_bmp(payload)
    elif payload[:8] == _PNG_SIG:
        px = _parse_png(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        px = _parse_gif(payload)
    else:
        raise NotImplementedError(
            "image decode supports netpbm/BMP/PNG/GIF here; other "
            "formats need media libraries absent from this environment"
        )
    if px.shape[2] in (2, 4):  # gray+alpha / RGBA → drop alpha
        px = px[:, :, : px.shape[2] - 1]
    return px, 255


def _resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of any supported image, re-encoded as
    netpbm P5/P6 (the normalization target: downstream stages see ONE
    format regardless of input container). Pure numpy fancy indexing —
    a real resize, no image libs."""
    px, maxval = _decode_image(payload)
    h, w, c = px.shape
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    out = px[rows[:, None], cols[None, :], :]
    magic = b"P6" if c == 3 else b"P5"
    header = magic + f"\n{width} {height}\n{maxval}\n".encode("ascii")
    return header + out.tobytes()


def resize_images(
    blobs: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Image resize over mapInPandas.

    Real path (``decode_stub=False``): netpbm/BMP/PNG/GIF payloads get
    a true nearest-neighbor resize (numpy only) re-encoded as netpbm —
    one normalized output format whatever the input container; JPEG &
    co raise (PIL absent). Stub path: deterministic truncate/pad to
    width*height bytes. Either way the batch shape, schema, and memory
    profile (output bounded by target size, not input size) are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if decode_stub:
                payloads = pdf["payload"].map(
                    lambda b: bytes(b)[:target].ljust(target, b"\0")
                )
            else:
                payloads = pdf["payload"].map(
                    lambda b: _resize_netpbm(bytes(b), width, height)
                )
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return blobs.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    blobs: DataFrame, num_frames: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one input blob → ``num_frames`` output rows
    (uniformly spaced), the row-explosion shape of video pipelines.

    REAL for YUV4MPEG2 (.y4m) payloads: the container is parsed with
    stdlib only (_parse_y4m) and the emitted frame payloads are the
    actual raw planar-YUV frames, uniformly sampled over the true frame
    count — under BOTH stub modes (a parseable format never stubs, same
    tiering as netpbm/BMP/WAV). Other containers (mp4/webm/...) need
    ffmpeg: deterministic byte slices under ``decode_stub=True``, loud
    NotImplementedError otherwise. Partitioning/row-fanout is real in
    every case.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payloads = [], [], []
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                data = bytes(payload)
                if data.startswith(b"YUV4MPEG2"):
                    _, _, _, frames = _parse_y4m(data)
                    for i, fi in enumerate(_frame_indices(len(frames), num_frames)):
                        out_ids.append(bid)
                        out_idx.append(i)
                        out_payloads.append(frames[fi])
                    continue
                if not decode_stub:
                    raise NotImplementedError(
                        "frame sampling beyond YUV4MPEG2 requires ffmpeg; "
                        "run with decode_stub=True"
                    )
                step = max(len(data) // num_frames, 1)
                for i in range(num_frames):
                    out_ids.append(bid)
                    out_idx.append(i)
                    out_payloads.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "blob_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_payload": out_payloads,
                }
            )

    return blobs.mapInPandas(run, FRAME_SCHEMA)


def extract_features(blobs: DataFrame, decode_stub: bool = True) -> DataFrame:
    """blob table → feature table via mapInPandas (Arrow batches).

    Each task sees an iterator of pandas batches — bounded memory
    regardless of total corpus size; decode parallelism = partitions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: sum(b[:256]) % (2**31)
                    ).astype("int64"),
                    "feature": payloads.map(lambda b: _decode_one(bytes(b), decode_stub)),
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)
