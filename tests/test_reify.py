from pyspark.sql import functions as F

from anything2rdf_spark import (
    RDF_OBJECT,
    RDF_PREDICATE,
    RDF_STATEMENT,
    RDF_SUBJECT,
    RDF_TYPE,
)
from anything2rdf_spark.operators import reify as RF
from anything2rdf_spark.sources import synth


def test_relationship_triples_shape(spark):
    rels = spark.createDataFrame(
        [("p001", "knows", "l002", 85, "1700", "1710", "IN")],
        "left_id string, rel_type string, right_id string, confidence int, start_year string, end_year string, qualifier string",
    )
    triples, quarantine = RF.relationship_triples(rels)
    assert quarantine.count() == 0
    rows = triples.collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["pred"], []).append(r)
    # plain edge with camelCased dynamic predicate
    assert any(p.endswith("#knows") for p in by_pred)
    # full reification quad
    for p in (RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT):
        assert p in by_pred
    stmt_subjs = {r["subj"] for r in by_pred[RDF_SUBJECT]}
    assert all("stmt_" in s for s in stmt_subjs)
    # type Statement
    assert any(r["obj_iri"] == RDF_STATEMENT for r in by_pred[RDF_TYPE])
    # confidence literal + certainty bucket
    assert by_pred[RF.P_CONFIDENCE][0]["obj_lit"] == "85"
    assert by_pred[RF.P_CERTAINTY][0]["obj_lit"] == "very likely "
    # time-span: IN qualifier sets all four points
    for p in (RF.P_BOB, RF.P_EOB, RF.P_BOE, RF.P_EOE):
        assert p in by_pred, p
    assert by_pred[RF.P_BOB][0]["obj_lit"] == "1700-01-01T00:00:00"
    assert by_pred[RF.P_EOE][0]["obj_lit"] == "1710-12-31T23:59:59"


def test_relationship_statement_iri_deterministic(spark):
    rels = spark.createDataFrame(
        [("p001", "knows", "l002", 85, "1700", "1710", "IN")] * 2,
        "left_id string, rel_type string, right_id string, confidence int, start_year string, end_year string, qualifier string",
    )
    triples, _ = RF.relationship_triples(rels)
    from anything2rdf_spark.operators.extract import dedup_triples

    # two identical rows → identical statement IRIs → dedup halves the rows
    assert dedup_triples(triples).count() * 2 == triples.count()


def test_relationship_quarantine_dangling_fk(spark):
    rels = synth.relationships(spark, n=32)
    d = synth.entity_dictionary(spark)
    triples, quarantine = RF.relationship_triples(rels, dictionary=d)
    assert quarantine.count() == 1
    assert quarantine.collect()[0]["left_id"] == "zzz_missing"
    assert triples.filter(F.col("subj").contains("zzz_missing")).count() == 0


def test_bf_qualifier_sets_only_eob(spark):
    rels = spark.createDataFrame(
        [("p001", "knows", "l002", None, "1700", "", "BF")],
        "left_id string, rel_type string, right_id string, confidence int, start_year string, end_year string, qualifier string",
    )
    triples, _ = RF.relationship_triples(rels)
    preds = {r["pred"] for r in triples.collect()}
    assert RF.P_EOB in preds
    assert RF.P_BOB not in preds and RF.P_BOE not in preds and RF.P_EOE not in preds
    assert RF.P_CONFIDENCE not in preds  # null confidence guarded


def test_inverse_property_triples(spark):
    pairs = spark.createDataFrame([("parent of", "child of")], "prop_label string, inverse_label string")
    t = RF.inverse_property_triples(pairs)
    rows = {(r["subj"], r["obj_iri"]) for r in t.collect()}
    assert len(rows) == 2
    a, b = sorted(rows)
    assert a == (b[1], b[0])  # symmetric pair


def test_relationship_triples_cidoc_vocab(spark):
    """vocab='cidoc' emits the reference's real CIDOC-CRM time-span IRIs
    (CIDOC.scala:61,101,233-236): P4_has_time-span, E52_Time-Span, and the
    4-point P82a/P81a/P81b/P82b properties."""
    from anything2rdf_spark import (
        CIDOC_BOB,
        CIDOC_BOE,
        CIDOC_EOB,
        CIDOC_EOE,
        CIDOC_HAS_TIMESPAN,
        CIDOC_TIMESPAN,
    )

    rels = spark.createDataFrame(
        [("p001", "knows", "l002", 85, "1700", "1710", "IN")],
        "left_id string, rel_type string, right_id string, confidence int, start_year string, end_year string, qualifier string",
    )
    triples, _ = RF.relationship_triples(rels, vocab="cidoc")
    preds = {r["pred"] for r in triples.collect()}
    assert {CIDOC_HAS_TIMESPAN, CIDOC_BOB, CIDOC_EOB, CIDOC_BOE, CIDOC_EOE} <= preds
    ts_types = {
        r["obj_iri"] for r in triples.filter(F.col("pred") == RDF_TYPE).collect()
    }
    assert CIDOC_TIMESPAN in ts_types
    # IN qualifier fills all four points
    four = triples.filter(F.col("pred").isin(CIDOC_BOB, CIDOC_EOB, CIDOC_BOE, CIDOC_EOE))
    assert four.count() == 4


def test_stmt_iri_distinct_per_qualifier(spark):
    """Two rows asserting the same (s,p,o) edge with different qualifiers
    must reify to DIFFERENT statements — (s,p,o)-only hashing conflated
    contradictory confidence/time-span values onto one rdf:Statement.
    Also: confidence=100 buckets to '' which means 'omit the qualifier',
    never an empty literal."""
    rels = spark.createDataFrame(
        [("a", "knows", "b", 95, "IN", "1700", "1701"),
         ("a", "knows", "b", 10, "BF", "1650", "1651"),
         ("a", "knows", "b", 100, "IN", "1700", "1701")],
        "left_id string, rel_type string, right_id string, confidence int,"
        " qualifier string, start_year string, end_year string",
    )
    triples, _ = RF.relationship_triples(rels)
    rows = triples.collect()
    stmts = {r["subj"] for r in rows if r["pred"].endswith("#subject")}
    assert len(stmts) == 3
    empties = [r for r in rows
               if r["pred"].endswith("descriptiveCertainty") and r["obj_lit"] == ""]
    assert not empties
