import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators import hierarchy as H


def test_rollup_content(spark):
    # statute tree: root ← a ← a1, a2 ; root ← b
    nodes = spark.createDataFrame(
        [
            ("root", None, "ROOT"),
            ("root/a", "root", "A"),
            ("root/a/1", "root/a", "A1"),
            ("root/a/2", "root/a", "A2"),
            ("root/b", "root", "B"),
        ],
        "id string, parent_id string, content string",
    )
    got = {r["id"]: r["complete_content"] for r in H.rollup_content(nodes).collect()}
    assert got["root/a"] == "A\nA1\nA2"
    assert got["root"] == "ROOT\nA\nA1\nA2\nB"
    assert got["root/b"] == "B"


def test_flatten_tree(spark):
    data = [
        (
            "r1",
            "Rome",
            [("c1", "Trip1", []), ("c2", "Trip2", [])],
        )
    ]
    df = spark.createDataFrame(
        data,
        "id string, name string, children array<struct<id:string, name:string, children:array<struct<id:string>>>>",
    )
    out = H.flatten_tree(df)
    rows = {r["id"]: (r["parent_id"], r["depth"]) for r in out.collect()}
    assert rows["r1"] == (None, 0)
    assert rows["c1"] == ("r1", 1) and rows["c2"] == ("r1", 1)


def test_dynamic_subclass_triples(spark):
    df = spark.createDataFrame([("letter",), ("letter",), ("postcard",)], "work_type string")
    t = H.dynamic_subclass_triples(df, "work_type", "http://x/Work")
    rows = {(r["subj"], r["obj_iri"]) for r in t.collect()}
    assert len(rows) == 2
    assert all(o == "http://x/Work" for _, o in rows)


def test_consistency_check(spark):
    edges = spark.createDataFrame([("paris", "france"), ("lyon", "france")], "place string, within string")
    forbidden = spark.createDataFrame([("paris", "england")], "place string, within string")
    H.consistency_check(edges, forbidden, ["place", "within"])  # passes
    bad_forbidden = spark.createDataFrame([("paris", "france")], "place string, within string")
    with pytest.raises(ValueError):
        H.consistency_check(edges, bad_forbidden, ["place", "within"])


def test_tm35fin_to_wgs84(spark):
    from anything2rdf_spark.functions.geo import tm35fin_to_wgs84

    # known point: Helsinki Cathedral ~ (E 386316, N 6672285) → ~60.170N, 24.952E
    df = spark.createDataFrame([(386316.0, 6672285.0)], "e double, n double")
    r = df.select(tm35fin_to_wgs84("e", "n").alias("g")).collect()[0]["g"]
    assert abs(r["lat"] - 60.170) < 0.01, r
    assert abs(r["lon"] - 24.952) < 0.01, r
    # round-trip sanity at projection origin: E=500000 → lon = 27
    df0 = spark.createDataFrame([(500000.0, 6653097.0)], "e double, n double")
    r0 = df0.select(tm35fin_to_wgs84("e", "n").alias("g")).collect()[0]["g"]
    assert abs(r0["lon"] - 27.0) < 1e-6
