"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with a typed metadata struct alongside. This module
provides the real Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow-batched UDF signatures — with the actual media
decoding STUBBED (the container has no image/audio libraries): decode
raises ``NotImplementedError`` unless the deterministic fake decoder is
requested, which produces reproducible pseudo-features from the bytes.

Batch shape: `mapInPandas` streams Arrow record batches, so payload
bytes never materialize as one big driver object; per-batch memory is
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms long, codec string"
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Demo payload builder: treat the UTF-8 text bytes as the opaque
    payload, with typed metadata — the same column shape a real
    image/audio table would have."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding from a payload: sha256-seeded,
    reproducible everywhere — stands in for a real image/audio encoder."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 - 0.5 for b in h)
        counter += 1
    return out[:dim]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    decoder: str = "stub",
) -> DataFrame:
    """Feature-extract each binary payload via ``mapInPandas``.

    decoder='stub'  → deterministic sha256 pseudo-features (testable);
    decoder='real'  → NotImplementedError (media libs not present; the
                      Spark-side plumbing is what this module delivers).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use decoder='stub'"
        )

    schema = f"{id_col} long, n_bytes long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len),
                    "features": pdf[payload_col].map(
                        lambda b: _fake_features(bytes(b), dim)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (doc, frame_ts)
    the decoder would emit. Duration is metadata-driven; the decode
    itself is the stubbed step. Shows the explode-shape a real sampler
    uses (rows scale with duration, not payload size)."""
    # greatest(…, 1): a clip shorter than the sampling interval still
    # emits its first frame — and Spark's sequence(0, -1) would
    # otherwise produce a DESCENDING [0, -1] sequence, not empty
    n_frames = F.greatest(
        F.coalesce(
            (F.col("media_meta.duration_ms") / every_ms).cast("int"), F.lit(1)
        ),
        F.lit(1),
    )
    return df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: (i * every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


def resize_plan(
    df: DataFrame,
    max_w: int = 64,
    max_h: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Aspect-fit resize *plan* for image payloads: the target-geometry
    arithmetic (the real part — scale factor, fitted dims, letterbox
    padding) as pure column expressions; the pixel resample itself is
    the stubbed decode step. Rows with NULL dims pass through with a
    NULL plan (audio/text payloads).

    Embarrassingly parallel projection — no shuffle at any size.
    """
    w = F.col("media_meta.width").cast("double")
    h = F.col("media_meta.height").cast("double")
    scale = F.least(max_w / w, max_h / h)
    dst_w = F.floor(w * scale).cast("int")
    dst_h = F.floor(h * scale).cast("int")
    return df.select(
        id_col,
        F.col("media_meta.width").alias("src_w"),
        F.col("media_meta.height").alias("src_h"),
        F.round(scale, 6).alias("scale"),
        dst_w.alias("dst_w"),
        dst_h.alias("dst_h"),
        (F.lit(max_w) - dst_w).alias("pad_x"),
        (F.lit(max_h) - dst_h).alias("pad_y"),
    )
