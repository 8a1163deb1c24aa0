from pyspark.sql import functions as F

from anything2rdf_spark import SCHEMA_NS, XSD_BOOLEAN
from anything2rdf_spark import iri
from anything2rdf_spark.functions import text as TX
from anything2rdf_spark.operators import melt as ML
from anything2rdf_spark.sources import readers as RD


def test_melt(spark):
    df = spark.createDataFrame([("k1", "a", 1), ("k2", None, 2)], "id string, x string, y int")
    out = ML.melt(df, ["id"])
    rows = {(r["id"], r["col_name"]): r["value"] for r in out.collect()}
    assert rows[("k1", "x")] == "a" and rows[("k1", "y")] == "1"
    assert rows[("k2", "x")] is None and rows[("k2", "y")] == "2"


def test_generic_column_triples_fallback_and_rules(spark):
    df = spark.createDataFrame(
        [("r1", "Y", "hello", "")], "id string, is_ok string, note string, empty string"
    )
    rules = spark.createDataFrame(
        [("note", SCHEMA_NS + "annotation", None)], "col_name string, pred_iri string, obj_dtype string"
    )
    t = ML.generic_column_triples(df, ["id"], iri.mint("row", "id"), rules)
    rows = {(r["pred"], r["obj_lit"], r["obj_dtype"]) for r in t.collect()}
    # rule-mapped column
    assert (SCHEMA_NS + "annotation", "hello", None) in rows
    # generic fallback: property camelCased from column name, Y → boolean
    assert (SCHEMA_NS + "isOk", "true", XSD_BOOLEAN) in rows
    # empty value guarded out
    assert len(rows) == 2


def test_label_set_dedup(spark):
    df = spark.createDataFrame(
        [("e1", "Ada", "Ada"), ("e1", "Ada", "Lovelace"), ("e1", "Ada Lovelace", "Ada")],
        "k string, pref string, alt string",
    )
    out = ML.label_set_dedup(df, "k", "pref", "alt").collect()[0]
    assert set(out["pref_labels"]) == {"Ada", "Ada Lovelace"}
    assert set(out["alt_labels"]) == {"Lovelace"}  # 'Ada' dropped: already pref


def test_drop_sentinels(spark):
    df = spark.createDataFrame([("N",), ("99",), ("real",), ("?",)], "v string")
    got = [r["o"] for r in df.select(TX.drop_sentinels("v").alias("o")).collect()]
    assert got == [None, None, "real", None]


def test_wikipedia_to_dbpedia(spark):
    df = spark.createDataFrame([("https://en.wikipedia.org/wiki/Ada_Lovelace",)], "u string")
    assert (
        df.select(TX.wikipedia_to_dbpedia("u").alias("v")).collect()[0]["v"]
        == "http://dbpedia.org/resource/Ada_Lovelace"
    )


def test_normalize_statute_id(spark):
    df = spark.createDataFrame([("1928:161",), ("14.6.1928/0161",)], "s string")
    got = [r["v"] for r in df.select(TX.normalize_statute_id("s").alias("v")).collect()]
    assert got == ["1928/161", "1928/161"]


def test_language_code(spark):
    df = spark.createDataFrame([("French",), ("Klingon",)], "l string")
    got = [r["v"] for r in df.select(TX.language_code("l").alias("v")).collect()]
    assert got == ["fr", None]
    df2 = spark.createDataFrame([("swe",)], "l string")
    assert df2.select(TX.language_code("l", TX.MARC_TO_ISO).alias("v")).collect()[0]["v"] == "sv"


def test_valid_iri_or_fallback(spark):
    df = spark.createDataFrame(
        [("http://good.example/x", "fb1"), ("not a uri", "fb2"), (None, "fb3")],
        "cand string, fb string",
    )
    got = [r["v"] for r in df.select(iri.valid_iri_or_fallback("cand", F.col("fb")).alias("v")).collect()]
    assert got == ["http://good.example/x", "fb2", "fb3"]


def test_csv_width_check(spark, tmp_path):
    p = tmp_path / "w.csv"
    p.write_text("a,b,c\n1,2,3\nx,y\n")
    good, quarantine = RD.csv_with_width_check(spark, str(p), expected_cols=3)
    assert good.count() == 2 and quarantine.count() == 1


def test_melt_handles_hostile_column_names(spark):
    """Arbitrary CSV headers — spaces, quotes, dots, backticks — are the
    whole point of melt; raw selectExpr interpolation used to mis-parse."""
    from anything2rdf_spark.operators.melt import melt

    df = spark.createDataFrame(
        [(1, "a", "b", "c", "d")],
        ["id", "it's", "First Name", "a.b", "we`ird"],
    )
    out = {r["col_name"]: r["value"] for r in melt(df, ["id"]).collect()}
    assert out == {"it's": "a", "First Name": "b", "a.b": "c", "we`ird": "d"}


def test_yn_coercion_only_for_fallback_columns(spark):
    """A rule-mapped column keeps its declared dtype — value 'N' in a mapped
    string column is the literal 'N', not boolean false (the Y/N fallback is
    scoped to unmatched columns, ceectsv2rdf:176-177)."""
    from anything2rdf_spark import iri
    from anything2rdf_spark.operators.melt import generic_column_triples

    df = spark.createDataFrame([(1, "N", "Y")], ["rid", "initial", "active"])
    rules = spark.createDataFrame(
        [("initial", "http://x/initial", None)],
        "col_name string, pred_iri string, obj_dtype string",
    )
    rows = {r["pred"]: (r["obj_lit"], r["obj_dtype"])
            for r in generic_column_triples(df, ["rid"], iri.mint("r", "rid"), rules).collect()}
    assert rows["http://x/initial"] == ("N", None)  # literal, rule dtype kept
    lit, dt = rows[[p for p in rows if p.endswith("active")][0]]
    assert lit == "true" and dt and dt.endswith("boolean")  # fallback coerces
