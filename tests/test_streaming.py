from anything2rdf_spark.operators.extract import dedup_triples, extract_triples
from anything2rdf_spark.streaming import stream_extract as SE
from anything2rdf_spark.sources import synth


def test_streaming_extraction_matches_batch(spark, tmp_path):
    ts = synth.transcripts(spark, n_convs=15, seed=33)
    src = str(tmp_path / "stream_src")
    ts.repartition(4).write.parquet(src)

    stream_out = SE.run_stream_to_memory(spark, src, name="t_stream")
    batch_out = extract_triples(spark.read.parquet(src))

    a = dedup_triples(stream_out)
    b = dedup_triples(batch_out)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_streaming_conv_stats_runs(spark, tmp_path):
    ts = synth.transcripts(spark, n_convs=10, seed=34)
    src = str(tmp_path / "stream_src2")
    ts.write.parquet(src)
    q = (
        SE.streaming_conv_stats(SE.read_transcripts_stream(spark, src))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM t_stats")
    assert out.count() > 0
    assert set(out.columns) == {"window", "conv_id", "n_turns", "max_turn_idx"}


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization (applyInPandasWithState) equals the
    batch windows.sessionize on an in-order replay, INCLUDING state carried
    across micro-batches (the two files split each conversation in time)."""
    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.windows import sessionize

    ts = synth.transcripts(spark, n_convs=12, seed=35).filter(F.col("ts").isNotNull())
    src = str(tmp_path / "stream_src3")
    # in-order replay: each conversation's earlier half lands in file 0,
    # later half in file 1 → the session counter must survive the batch gap
    mid = ts.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    early, late = ts.filter(F.col("ts") <= mid), ts.filter(F.col("ts") > mid)
    early.coalesce(1).sortWithinPartitions("conv_id", "ts", "turn_idx").write.parquet(src)
    # file-source micro-batch order follows modification time: make sure the
    # two files cannot tie on the same timestamp
    import time as _time

    _time.sleep(1.1)
    late.coalesce(1).sortWithinPartitions("conv_id", "ts", "turn_idx").write.mode("append").parquet(src)

    got = SE.run_sessionize_stream_to_memory(spark, src, name="t_sess")
    # streaming ids are keyed on session start time (collision-free across
    # state evictions) — compare against the batch operator's start_ts mode
    want = sessionize(ts, gap_minutes=30, id_mode="start_ts")

    g = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in got.collect()}
    w = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in want.collect()}
    assert len(g) == len(w)
    assert g == w


def test_streaming_sessionize_non_utc_session_tz(spark, tmp_path):
    """Session ids are keyed on the true UTC epoch of the session start: a
    non-UTC spark.sql.session.timeZone must not shift them. Timestamps cross
    into pandas tz-naive in the SESSION timezone, so deriving the epoch with
    pd.Timestamp(...).timestamp() (which assumes UTC) diverged from the batch
    operator whenever tz != UTC — the epoch now comes from a native
    ts.cast('long') column computed before the stateful function."""
    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.windows import sessionize

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ts = synth.transcripts(spark, n_convs=8, seed=36).filter(F.col("ts").isNotNull())
        src = str(tmp_path / "stream_src_tz")
        ts.coalesce(1).sortWithinPartitions("conv_id", "ts", "turn_idx").write.parquet(src)
        got = SE.run_sessionize_stream_to_memory(spark, src, name="t_sess_tz")
        want = sessionize(ts, gap_minutes=30, id_mode="start_ts")
        g = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in got.collect()}
        w = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in want.collect()}
        assert len(g) == len(w)
        assert g == w
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_streaming_sessionize_state_eviction_across_watermark(spark, tmp_path):
    """EventTimeTimeout eviction: file 1 advances the watermark far past
    conv cA's last_ts + gap (state evicted) AND carries a late-but-admissible
    cA event — the new session id must not collide with the pre-eviction one
    and must equal the batch start_ts sessionization."""
    import time as _time

    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.windows import sessionize

    sch = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    rows0 = [
        ("cA", 0, "user", "x", None, "2024-01-01 00:00:00"),
        ("cA", 1, "user", "x", None, "2024-01-01 00:10:00"),
    ]
    rows1 = [
        ("cB", 0, "user", "x", None, "2024-01-02 00:00:00"),  # watermark pusher
        ("cA", 2, "user", "x", None, "2024-01-01 23:30:00"),
    ]
    src = str(tmp_path / "evict_src")

    def write(rows, mode):
        spark.createDataFrame(rows, sch).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.col("ts").cast("timestamp").alias("ts"),
        ).coalesce(1).write.mode(mode).parquet(src)

    write(rows0, "overwrite")
    _time.sleep(1.1)  # distinct mtimes → deterministic micro-batch order
    write(rows1, "append")

    got = SE.run_sessionize_stream_to_memory(spark, src, name="t_evict", max_files=1)
    g = sorted((r["conv_id"], r["turn_idx"], r["session_id"]) for r in got.collect())
    batch = spark.createDataFrame(rows0 + rows1, sch).select(
        "conv_id", "turn_idx", F.col("ts").cast("timestamp").alias("ts")
    )
    w = sorted(
        (r["conv_id"], r["turn_idx"], r["session_id"])
        for r in sessionize(batch, gap_minutes=30, id_mode="start_ts").collect()
    )
    assert g == w
    sessions = {s for _, _, s in g}
    assert len(sessions) == 3  # cA pre-eviction, cA post-eviction, cB


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark over the text fingerprint equals batch
    dropDuplicates for duplicates arriving inside the watermark window,
    including duplicates split ACROSS micro-batches."""
    import time

    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.textstats import doc_fingerprint

    ts = synth.transcripts(spark, n_convs=8, seed=35)
    # duplicate half the turns verbatim (formatting noise only differs)
    dup = ts.withColumn("text", F.concat(F.col("text"), F.lit("  "))).limit(40)
    src = str(tmp_path / "dedup_src")
    ts.coalesce(1).write.parquet(src)
    time.sleep(1.1)  # distinct mtimes: duplicates arrive in a LATER micro-batch
    dup.coalesce(1).write.mode("append").parquet(src)

    q = (
        SE.streaming_dedup_turns(SE.read_transcripts_stream(spark, src, max_files=1))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM t_dedup")

    batch = (
        spark.read.parquet(src)
        .withColumn("fp", doc_fingerprint("text"))
        .dropDuplicates(["fp"])
    )
    assert got.count() == batch.count()
    assert (
        got.select("fp").exceptAll(batch.select("fp")).count() == 0
        and batch.select("fp").exceptAll(got.select("fp")).count() == 0
    )


def test_streaming_curate_matches_batch(spark, tmp_path):
    """streaming_curate ≡ batch curate_corpus on the surviving CONTENT
    (lang/quality/tokens/clean_text): exact duplicates split across
    micro-batches dedup to one survivor; the de doc and the junk doc are
    filtered in both engines; the PII doc is scrubbed identically. doc_id
    is excluded from the compare — the stream keeps the first-arrived
    duplicate, batch keeps min-id (documented semantic difference)."""
    import time

    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.curation import curate_corpus

    rows1 = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the old barn in a field"),
        (3, "der mann und die frau ist mit dem kind auf ein fest und das ist nicht schlecht"),
        (4, "tiny junk"),
    ]
    rows2 = [
        (2, "the quick brown fox jumps over the lazy dog and runs to the old barn in a field"),
        (5, "the report for the team is ready and the contact is bob@corp.example so call for the order on the table"),
    ]
    src = str(tmp_path / "curate_src")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    )
    mk(rows1).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # duplicate arrives in a LATER micro-batch
    mk(rows2).coalesce(1).write.mode("append").parquet(src)

    q = (
        SE.streaming_curate(SE.read_documents_stream(spark, src, max_files=1))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_curate")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT lang_guess, quality, ws_tokens, clean_text FROM t_curate")

    batch = curate_corpus(
        spark.createDataFrame(rows1 + rows2, "doc_id long, text string"), langs=("en",)
    ).select("lang_guess", "quality", "ws_tokens", "clean_text")
    assert got.count() == batch.count() == 2  # dup collapsed; de + junk-lang rows judged same
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
    assert got.filter(F.col("clean_text").contains("<EMAIL>")).count() == 1


def test_streaming_curate_html_c4_matches_batch(spark, tmp_path):
    """With html+c4_rules on, stream ≡ batch on surviving content: the HTML
    page survives extraction + line rules identically, the lorem page and
    the no-terminal-punct page drop in both engines."""
    import time

    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.curation import curate_corpus

    rows1 = [
        (1, "<p>The farmer walked to the barn at dawn with his good tools.</p>"
            "<p>The second sentence is here to keep the page alive today.</p>"
            "<p>The third sentence rounds out the surviving page for now.</p>"),
        (2, "<p>Lorem ipsum dolor sit amet consectetur adipiscing elit.</p>"
            "<p>More filler for the doomed page goes right here today.</p>"
            "<p>The third line keeps the count safe in this page too.</p>"),
    ]
    rows2 = [
        (3, "no markup and no terminal punctuation on this single line"),
    ]
    src = str(tmp_path / "curate_c4_src")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    )
    mk(rows1).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    mk(rows2).coalesce(1).write.mode("append").parquet(src)

    q = (
        SE.streaming_curate(
            SE.read_documents_stream(spark, src, max_files=1),
            langs=None, html=True, c4_rules=True,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_curate_c4")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT lang_guess, quality, ws_tokens, clean_text FROM t_curate_c4")
    batch = curate_corpus(
        spark.createDataFrame(rows1 + rows2, "doc_id long, text string"),
        langs=None, html=True, c4_rules=True,
    ).select("lang_guess", "quality", "ws_tokens", "clean_text")
    assert got.count() == batch.count() == 1
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
    assert "\n" in got.first()["clean_text"]
