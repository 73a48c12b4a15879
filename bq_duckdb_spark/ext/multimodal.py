"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs via
``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_stub=True`` produces deterministic fake features so
the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested; wiring a real decoder is a drop-in
replacement of ``_decode_one``.

Scale design: blobs stay columnar in parquet; feature extraction is
``mapInPandas`` (one Arrow batch at a time, bounded memory per task);
repartition by size class before decode when blob sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    source (here: text bytes stand in for encoded media)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("blob_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _decode_one(payload: bytes, decode_stub: bool) -> list[float]:
    """Decode a media payload into a feature vector.

    STUB: real decode (PIL/librosa/ffmpeg frame-sampling) is unavailable
    in this container. The stub derives a deterministic 8-dim feature
    from the bytes so the pipeline shape is fully exercised.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; run with decode_stub=True"
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


def resize_images(
    blobs: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Image resize over mapInPandas.

    STUB: without PIL the "resize" deterministically truncates/pads the
    payload to width*height bytes — the batch shape, schema, and
    memory profile (output bounded by target size, not input size) are
    the real thing; swapping in PIL's resize is local to this function.
    """
    if not decode_stub:
        raise NotImplementedError("image resize requires PIL; run with decode_stub=True")
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\0")
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

    STUB: frames are deterministic byte slices instead of decoded video
    (no ffmpeg here); partitioning/row-fanout behavior is real.
    """
    if not decode_stub:
        raise NotImplementedError("frame sampling requires ffmpeg; run with decode_stub=True")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payloads = [], [], []
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                data = bytes(payload)
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
