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


def streaming_dedup_turns(transcripts_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Bounded-state streaming exact-dedup: fingerprint each turn's text
    (same normalization as the batch `textstats.doc_fingerprint`) and drop
    duplicates via ``dropDuplicatesWithinWatermark`` — the state store keeps
    one row per fingerprint only until the watermark passes it, so state is
    bounded by (arrival rate × watermark), not by stream length. The batch
    equivalent (``dropDuplicates`` on the same fingerprint) is test-enforced
    for duplicates arriving inside the watermark window."""
    from ..operators.textstats import doc_fingerprint

    return (
        transcripts_stream.withColumn("fp", doc_fingerprint("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
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


# --- custom stateful operator: streaming gap-sessionization ----------------

SESSION_STATE_SCHEMA = "last_ts long, session_start long"
SESSION_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, session_id string"
)


def streaming_sessionize(
    transcripts_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``:
    per-conversation state carries (last event-time seconds, current session
    start seconds); a gap > ``gap_minutes`` opens a new session. The
    streaming analog of ``operators.windows.sessionize(id_mode='start_ts')``
    — equality with the batch operator is test-enforced on in-order replays;
    out-of-order arrivals within the watermark are sessionized in arrival
    order, which is the documented semantic difference of the streaming
    variant.

    State size is O(active conversations) × 16 bytes, and state IS evicted:
    ``EventTimeTimeout`` fires once the watermark passes the conversation's
    ``last_ts + gap`` — at that point no admissible future event (all have
    ts ≥ watermark > last_ts + gap) could extend the current session, so the
    state is dead weight and is removed. A conversation that returns later
    necessarily opens a new session; ids are keyed on the session's first
    event time (``conv#<start_epoch>``), so ids from before and after an
    eviction can never collide (a sequence counter would restart at 1).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            # watermark > last_ts + gap: no admissible event can extend
            # this session — drop the state, emit nothing
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [], "turn_idx": [], "ts": [], "session_id": []}
            )
            return
        if state.exists:
            last_ts, session_start = state.get
        else:
            last_ts, session_start = None, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["tsec", "turn_idx"])
            for ts, tsec, turn_idx in zip(pdf["ts"], pdf["tsec"], pdf["turn_idx"]):
                tsec = int(tsec)
                if last_ts is None or tsec - last_ts > gap_s:
                    session_start = tsec
                last_ts = tsec
                out.append((conv_id, int(turn_idx), ts, f"{conv_id}#{session_start}"))
        state.update((last_ts, session_start))
        # evict once the watermark proves the session can't continue; the
        # timeout timestamp must sit above the current watermark, which can
        # already exceed last_ts + gap when this conversation's events lag
        # the stream's max event time
        state.setTimeoutTimestamp(
            max((last_ts + gap_s) * 1000, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(out, columns=["conv_id", "turn_idx", "ts", "session_id"])

    # Epoch seconds are derived NATIVELY before the stateful function:
    # timestamps cross into pandas converted to spark.sql.session.timeZone
    # and tz-naive, so pd.Timestamp(ts).timestamp() would read them as UTC
    # and shift session ids / DST-straddling gaps whenever the session tz is
    # not UTC. ts.cast("long") is the true UTC epoch regardless of tz —
    # matching the batch sessionize(id_mode='start_ts') _epoch_seconds.
    return (
        transcripts_stream.withColumn("tsec", F.col("ts").cast("long"))
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_stream_to_memory(
    spark: SparkSession, src_path: str, name: str = "stream_sessions",
    gap_minutes: int = 30, max_files: int = 1,
):
    """Synchronous local harness for the stateful sessionizer.
    ``max_files=1`` forces one micro-batch per input file so tests exercise
    state carried across batches."""
    q = (
        streaming_sessionize(read_transcripts_stream(spark, src_path, max_files=max_files), gap_minutes)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# --- streaming corpus curation ---------------------------------------------

DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


def read_documents_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_curate(
    doc_stream: DataFrame,
    langs=("en",),
    min_quality: float = 0.0,
    watermark: str = "10 minutes",
    html: bool = False,
    c4_rules: bool = False,
) -> DataFrame:
    """Streaming analog of ``curation.curate_corpus``: bounded-state exact
    dedup — ``dropDuplicatesWithinWatermark`` on the same normalized
    content hash the batch chain uses, so state is (arrival rate x
    watermark), never corpus size — followed by the identical scan-local
    language / quality / PII / token expressions (they are pure narrow ops,
    so they compose with readStream unchanged, same argument as
    streaming_triples).

    One deliberate semantic difference from batch, inherent to streams:
    the surviving duplicate is the FIRST-ARRIVED one, not the min-id one —
    picking min-id would need unbounded reordering state. Everything
    derived from the surviving row (lang, quality, clean_text, tokens) is
    identical either way because the duplicates' texts are equal by
    construction; the batch-equivalence test compares on those columns.

    ``html``/``c4_rules`` prepend the same scan-local HTML extraction and
    C4 line rules the batch chain grew (pure narrow ops — they compose
    with readStream unchanged), applied BEFORE dedup exactly like batch so
    the stream ≡ batch equivalence holds content-for-content.
    """
    from ..operators.curation import apply_html_c4
    from ..operators.dedupe import normalized_text
    from ..operators.textstats import lang_id, quality_score, redact_pii, ws_token_count

    doc_stream = apply_html_c4(doc_stream, html=html, c4_rules=c4_rules)
    d = (
        doc_stream.withColumn("_fp", F.sha2(normalized_text("text"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
    d = d.withColumn("lang_guess", lang_id("text"))
    if langs is not None:
        d = d.filter(F.col("lang_guess").isin(list(langs)))
    d = d.withColumn("quality", F.round(quality_score("text"), 6))
    if min_quality > 0.0:
        d = d.filter(F.col("quality") >= min_quality)
    return d.select(
        "doc_id",
        "lang_guess",
        "quality",
        ws_token_count("text").alias("ws_tokens"),
        redact_pii("text").alias("clean_text"),
    )
