"""Structured-Streaming extraction — the generalization of the reference's
one streaming converter (VIAF: read / process / write overlap,
VIAFXML2RDF.scala:248-255) without its global output lock
(VIAFXML2RDF.scala:176 ``m.synchronized``).

Transcripts arriving as files (or Kafka at deployment) stream through the
SAME extraction expressions as the batch stage — `extract_triples` is a pure
narrow transformation, so it composes with readStream unchanged. Late turns
are bounded by a watermark on ``ts``; per-conversation rolling aggregates
use event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_triples
from ..schemas import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_triples(transcripts_stream: DataFrame) -> DataFrame:
    """Stream → candidate triples. Stateless narrow ops only — dedup (a
    stateful global set) stays in the batch materialize stage; a streaming
    deployment would run `dropDuplicatesWithinWatermark` on the triple key
    for bounded-state streaming dedup."""
    return extract_triples(transcripts_stream)


def streaming_conv_stats(transcripts_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Windowed per-conversation turn counts with late-data watermark —
    the streaming analog of per-conversation rollups."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
    )


def run_stream_to_memory(spark: SparkSession, src_path: str, name: str = "stream_triples"):
    """Drive the streaming extraction synchronously over existing files
    (local smoke harness): memory sink + processAllAvailable."""
    q = (
        streaming_triples(read_transcripts_stream(spark, src_path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
