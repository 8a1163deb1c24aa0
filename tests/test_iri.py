from pyspark.sql import functions as F

from anything2rdf_spark import NS, SCHEMA_NS
from anything2rdf_spark import iri


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_mint_natural_key(spark):
    df = spark.createDataFrame([("c1", 3)], "conv_id string, turn_idx int")
    row = df.select(iri.turn_iri().alias("t"), iri.conv_iri().alias("c")).collect()[0]
    assert row["t"] == NS + "turn_c1_3"
    assert row["c"] == NS + "conversation_c1"


def test_mint_url_encodes(spark):
    df = spark.createDataFrame([("a b/c",)], "conv_id string")
    row = df.select(iri.mint("x", "conv_id").alias("v")).collect()[0]
    assert " " not in row["v"] and "/c" not in row["v"].removeprefix(NS)


def test_mint_deterministic_across_partitions(spark):
    df = spark.createDataFrame([("c1", i) for i in range(100)], "conv_id string, turn_idx int")
    a = set(r["t"] for r in df.repartition(8).select(iri.turn_iri().alias("t")).collect())
    b = set(r["t"] for r in df.coalesce(1).select(iri.turn_iri().alias("t")).collect())
    assert a == b and len(a) == 100


def test_camel_case(spark):
    # Anything2RDF.scala:79-90 semantics
    assert one(spark, iri.camel_case(F.lit("speech act"))) == "SpeechAct"
    assert one(spark, iri.property_camel_case(F.lit("speech act"))) == "speechAct"
    assert one(spark, iri.camel_case(F.lit("has-known_relationship"))) == "HasKnownRelationship"
    assert one(spark, iri.un_camel_case(F.lit("speechAct"))) == "speech Act"


def test_schema_iris(spark):
    assert one(spark, iri.schema_class_iri(F.lit("speech act"))) == SCHEMA_NS + "SpeechAct"
    assert one(spark, iri.schema_prop_iri(F.lit("word count"))) == SCHEMA_NS + "wordCount"


def test_mint_hashed_stable(spark):
    v1 = one(spark, iri.mint_hashed("stmt", F.lit("s"), F.lit("p"), F.lit("o")))
    v2 = one(spark, iri.mint_hashed("stmt", F.lit("s"), F.lit("p"), F.lit("o")))
    v3 = one(spark, iri.mint_hashed("stmt", F.lit("s"), F.lit("p"), F.lit("q")))
    assert v1 == v2 != v3
    assert v1.startswith(NS + "stmt_")


def test_bnode_deterministic(spark):
    v1 = one(spark, iri.bnode(F.lit("a"), F.lit("b")))
    assert v1.startswith("_:b") and len(v1) == 3 + 24


def test_valid_iri_accepts_scheme_only_iris(spark):
    """urn:/mailto:/doi: are valid absolute IRIs (Jena IRIFactory accepts
    them); only schemeless or whitespace-bearing candidates fall back."""
    from pyspark.sql import functions as F

    rows = [("urn:isbn:0451450523",), ("mailto:a@b.example",),
            ("http://x/ok",), ("not a iri",), (None,)]
    df = spark.createDataFrame(rows, "c string")
    out = [r["o"] for r in df.select(
        iri.valid_iri_or_fallback("c", F.lit("FB")).alias("o")).collect()]
    assert out == ["urn:isbn:0451450523", "mailto:a@b.example",
                   "http://x/ok", "FB", "FB"]


def test_mint_hashed_null_components_stay_distinct(spark):
    """concat_ws silently drops NULLs, so without the \\x00 sentinel two
    keys differing only in WHICH component is null (1771/NULL vs NULL/1771)
    would collapse to one statement IRI and merge contradictory qualifiers
    (r4 ADVICE). NULL must also stay distinct from the empty string."""
    from pyspark.sql import functions as F

    def mint(a, b):
        return one(
            spark,
            iri.mint_hashed(
                "stmt",
                F.lit("s"), F.lit("p"), F.lit("o"),
                F.lit(a).cast("string"), F.lit(b).cast("string"),
            ),
        )

    assert mint("1771", None) != mint(None, "1771")
    assert mint("1771", None) != mint("1771", "")
    assert mint(None, None) != mint("", "")
    assert mint("1771", "1772") == mint("1771", "1772")  # still deterministic
