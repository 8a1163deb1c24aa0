"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the codec step is STUBBED — the container
has no image/audio libraries — behind ``decoder=`` hooks. A real deployment
passes e.g. a Pillow/torchaudio decoder; tests use the deterministic fake.

Pattern: ``mapInPandas`` with an ``Iterator[pd.DataFrame]`` so one Arrow
batch of binary payloads is decoded at a time (bounded executor memory —
crucial when payloads are MBs each; pair with a small
``spark.sql.files.maxPartitionBytes`` / ``maxRecordsPerBatch`` at scale).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


def real_decode_stub(payload: bytes, kind: str):
    """The library-backed decode step — NOT available in this container."""
    raise NotImplementedError(
        "media decode requires Pillow/torchaudio/pyav; inject a decoder via "
        "extract_features(decoder=...)"
    )


def fake_decoder(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in decoder: 8 floats derived from the payload
    digest — lets the full Spark plumbing be exercised and asserted."""
    if payload is None:
        return []
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:8]]


def portable_decoder(payload: bytes, kind: str) -> list[float]:
    """fake_decoder's engine-portable twin: hashes the payload's lowercase
    hex encoding (a VARCHAR any SQL engine can sha256) instead of the raw
    bytes — used by the driver's oracle-checked query so DuckDB can
    recompute the exact feature vector."""
    if payload is None:
        return []
    d = hashlib.sha256(payload.hex().encode("ascii")).digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(df: DataFrame, decoder=fake_decoder) -> DataFrame:
    """Binary payloads → fixed-size feature vectors via Arrow-batched
    ``mapInPandas``. Column pruning matters: only (media_id, kind, payload)
    are read from the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, k) if p is not None else []
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp from
    metadata only (no decode) — the scheduling half of frame extraction,
    fully native."""
    return (
        df.filter((F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = sha-derived bytes)."""
    base = spark.range(n).select(
        F.format_string("m%05d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), 3) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256).alias("hex"),
        F.col("id"),
    )
    return base.select(
        "media_id",
        "kind",
        F.when(F.col("kind") == "image", "image/png")
        .when(F.col("kind") == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.to_binary("hex", F.lit("hex")).alias("payload"),
        F.struct(
            F.when(F.col("kind") == "image", (F.pmod(F.col("id"), 512) + 32).cast("int")).alias("width"),
            F.when(F.col("kind") == "image", (F.pmod(F.col("id"), 256) + 32).cast("int")).alias("height"),
            F.when(F.col("kind") != "image", (F.pmod(F.col("id"), 5000) + 1000).cast("int")).alias("duration_ms"),
            F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
        ).alias("meta"),
    )
