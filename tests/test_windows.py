import datetime as dt

from pyspark.sql import functions as F

from anything2rdf_spark import NS
from anything2rdf_spark.operators import windows as WD
from anything2rdf_spark.sources import synth


def test_ordered_turns_invariant_under_input_order(spark):
    """Per-turn text equality under stable turn ordering (input_hint): the
    rank is a pure function of turn_idx regardless of row order."""
    ts = synth.transcripts(spark, n_convs=20, seed=9, shuffle_rows=True)
    a = WD.ordered_turns(ts).select("conv_id", "turn_idx", "turn_rank", "text")
    b = WD.ordered_turns(ts.orderBy("conv_id", "turn_idx")).select(
        "conv_id", "turn_idx", "turn_rank", "text"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    bad = a.filter(F.col("turn_rank") != F.col("turn_idx") + 1).count()
    assert bad == 0  # contiguous turn_idx → rank = idx+1


def test_ordered_turns_skew_safe_equals_plain(spark):
    ts = synth.transcripts(spark, n_convs=40, seed=17)  # includes conv_hot
    plain = WD.ordered_turns(ts).select("conv_id", "turn_idx", "turn_rank")
    salted = WD.ordered_turns_skew_safe(ts, bucket_size=16).select(
        "conv_id", "turn_idx", "turn_rank"
    )
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0


def test_next_turn_triples(spark):
    df = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c1", 2), ("c2", 0)], "conv_id string, turn_idx int"
    )
    t = WD.next_turn_triples(df)
    rows = {(r["subj"], r["obj_iri"]) for r in t.collect()}
    assert rows == {
        (NS + "turn_c1_0", NS + "turn_c1_1"),
        (NS + "turn_c1_1", NS + "turn_c1_2"),
    }


def test_path_prefix_hierarchy(spark):
    df = spark.createDataFrame([("a_b_c",), ("a_b",), ("x",)], "net string")
    got = {(r["narrower"], r["broader"]) for r in WD.path_prefix_hierarchy(df, "net").collect()}
    assert got == {("a_b_c", "a_b"), ("a_b", "a")}


def test_numeric_prefix_hierarchy(spark):
    df = spark.createDataFrame([("841",), ("84",), ("8",)], "code string")
    got = {(r["code"], r["broader"]) for r in WD.numeric_prefix_hierarchy(df, "code").collect()}
    assert got == {("841", "84"), ("84", "8")}


def test_last_marker_propagation(spark):
    lines = spark.createDataFrame(
        [(1, "L1", None), (2, None, "body a"), (3, None, "body b"), (4, "L2", None), (5, None, "body c")],
        "line_no int, marker string, body string",
    )
    out = WD.last_marker_propagation(lines, "marker", "line_no")
    grouped = (
        out.filter(F.col("body").isNotNull())
        .groupBy("current_marker")
        .agg(F.concat_ws("\n", F.collect_list("body")).alias("text"))
    )
    got = {r["current_marker"]: r["text"] for r in grouped.collect()}
    assert got == {"L1": "body a\nbody b", "L2": "body c"}


def test_sessionize(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, base),
        ("c1", 1, base + dt.timedelta(minutes=5)),
        ("c1", 2, base + dt.timedelta(minutes=90)),  # gap > 30 → new session
        ("c2", 0, base),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = WD.sessionize(df, gap_minutes=30)
    got = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in out.collect()}
    assert got == {("c1", 0): "c1#1", ("c1", 1): "c1#1", ("c1", 2): "c1#2", ("c2", 0): "c2#1"}


def test_skew_safe_conv_stats_matches_plain(spark):
    ts = synth.transcripts(spark, n_convs=50, seed=13)
    from anything2rdf_spark.functions.text import wordcount

    plain = ts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.coalesce(wordcount("text"), F.lit(0))).alias("total_words"),
    )
    salted = WD.skew_safe_conv_stats(ts, bucket_size=7)
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0


def test_next_turn_triples_join_equals_window(spark):
    """Skew-safe successor-edge join variant must equal the lead() window
    operator exactly, including on a hot conversation."""
    from anything2rdf_spark.operators import windows as WD
    from anything2rdf_spark.sources import synth

    ts = synth.transcripts(spark, n_convs=12, seed=51)
    a = WD.next_turn_triples(ts)
    b = WD.next_turn_triples_join(ts)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
