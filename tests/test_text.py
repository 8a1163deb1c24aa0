import re

from pyspark.sql import functions as F

from anything2rdf_spark.functions import text as TX


def py_wordcount(t: str) -> int:
    """Oracle: the reference counts whitespace runs (OBCXML2RDF.scala:210)."""
    return len(re.findall(r"\s+", t))


def test_wordcount_matches_reference_semantics(spark):
    cases = ["a b c", "", "one", "  leading", "trailing  ", "a\n\nb\tc", "  ", "a  b"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {r["t"]: r["wc"] for r in df.select("t", TX.wordcount("t").alias("wc")).collect()}
    for c in cases:
        assert got[c] == py_wordcount(c), repr(c)


def test_multi_value_split(spark):
    df = spark.createDataFrame([("a, b;; c |d\ne,",)], "s string")
    got = df.select(TX.multi_value_split("s").alias("v")).collect()[0]["v"]
    assert got == ["a", "b", "c", "d", "e"]


def test_punct_trim(spark):
    df = spark.createDataFrame([("--Hello, World!--",), ("(x)",), ("ok",)], "s string")
    got = [r["v"] for r in df.select(TX.punct_trim("s").alias("v")).collect()]
    assert got == ["Hello, World", "x", "ok"]


def test_strip_wiki_markup(spark):
    df = spark.createDataFrame([("see [[Foo|the foo]] and [[Bar]] '''bold'''",)], "s string")
    got = df.select(TX.strip_wiki_markup("s").alias("v")).collect()[0]["v"]
    assert got == "see the foo and Bar bold"


def test_expand_abbreviations(spark):
    df = spark.createDataFrame([("visited St. P. yesterday; P. too",)], "s string")
    got = df.select(
        TX.expand_abbreviations("s", {"St. P.": "Saint Petersburg", "P.": "Paris"}).alias("v")
    ).collect()[0]["v"]
    assert got == "visited Saint Petersburg yesterday; Paris too"


def test_yn_bool_and_gender(spark):
    df = spark.createDataFrame([("Y", "M"), ("N", "f"), ("?", "x")], "yn string, g string")
    rows = df.select(TX.yn_bool("yn").alias("b"), TX.gender_label("g").alias("g2")).collect()
    assert [(r["b"], r["g2"]) for r in rows] == [(True, "male"), (False, "female"), (None, None)]


def test_nfc_normalize(spark):
    decomposed = "étude"  # é as e + combining acute
    df = spark.createDataFrame([(decomposed,), (None,)], "s string")
    got = [r["v"] for r in df.select(TX.nfc_normalize("s").alias("v")).collect()]
    assert got[0] == "étude" and got[1] is None


def test_norm_surface(spark):
    df = spark.createDataFrame([("  --Ada   LOVELACE!  ",)], "s string")
    got = df.select(TX.norm_surface("s").alias("v")).collect()[0]["v"]
    assert got == "ada lovelace"


def test_mention_scan(spark):
    scan = TX.mention_scan_udf(["Ada Lovelace", "Ada", "Charles Babbage"])
    df = spark.createDataFrame(
        [("Ada Lovelace met CHARLES BABBAGE; ada wrote.",), ("no names here",), (None,)],
        "t string",
    )
    got = [r["m"] for r in df.select(scan(F.col("t")).alias("m")).collect()]
    assert got[0] == ["Ada Lovelace", "Charles Babbage", "Ada"]  # longest-first, canonical casing
    assert got[1] == [] and got[2] == []


def test_extract_embedded_ids(spark):
    df = spark.createDataFrame([("x (123) y (45)",)], "s string")
    got = df.select(TX.extract_embedded_ids("s").alias("v")).collect()[0]["v"]
    assert got == ["123", "45"]


def test_zero_pad_id(spark):
    df = spark.createDataFrame([(123,)], "i long")
    assert df.select(TX.zero_pad_id("i").alias("v")).collect()[0]["v"] == "00000123"
