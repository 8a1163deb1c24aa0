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
