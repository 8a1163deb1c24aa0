"""Round-6 optimization guard: the fully-native mention engine
(functions.text.mention_matches, JVM regexp + literal canon map) must
reproduce the 'regex' pandas-UDF engine exactly — leftmost,
longest-alternative-first, non-overlapping, word-boundary, canonical-casing
— on adversarial fixtures and on the real synth transcripts the driver's
gated queries scan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from anything2rdf_spark.functions import text as TX
from anything2rdf_spark.sources import synth


def _compare(spark, surfaces, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    scan_udf = TX.mention_scan_udf(surfaces, engine="regex")
    rows = df.select(
        "text",
        TX.mention_matches(F.col("text"), surfaces, engine="native").alias("nat"),
        scan_udf(F.col("text")).alias("ref"),
    ).collect()
    for r in rows:
        assert r.nat == r.ref, f"native/regex drift on {r.text!r}: {r.nat} != {r.ref}"


def test_native_engine_fixtures(spark):
    surfaces = ["Ada Lovelace", "Ada", "Charles Babbage", "Tim Berners-Lee", "CERN"]
    _compare(
        spark,
        surfaces,
        [
            None,
            "",
            "   ",
            "Ada Lovelace met CHARLES BABBAGE; ada wrote.",
            "no names here",
            "ada lovelace ada lovelace ada",
            "xada adax _ada ada_ (ada) [Ada] ada, .ada",
            "Tim Berners-Lee and tim berners-lee and berners-lee",
            "CERN? CERN! cern. Ada\nLovelace on two lines",
            "overlap AdaAda Lovelace",
        ],
    )


def test_native_engine_unicode_casefold(spark):
    # micro sign µ vs Greek mu μ: plain-lowercase semantics, no match for µ
    surfaces = ["μm", "Ada"]
    _compare(spark, surfaces, ["size in µm here", "about μm units", "ada spoke"])


def test_native_engine_case_variant_canon(spark):
    df = spark.createDataFrame([("ibm ships",)], "text string")
    got = df.select(
        TX.mention_matches(F.col("text"), ["IBM", "Ibm"], engine="native").alias("m")
    ).collect()[0]["m"]
    assert got == ["Ibm"]


def test_native_engine_metachars_and_accents(spark):
    surfaces = ["Études Institute", "--Études--", "a.b", "x (y)", "c+d", "q|r"]
    _compare(
        spark,
        surfaces,
        [
            "visit the Études Institute today",
            "études institute in lowercase",
            "a.b literal but not aXb",
            "x (y) and c+d and q|r appear",
            "étude prefix no match",
        ],
    )


def test_native_engine_random_ascii_corpus(spark):
    surfaces = [
        "Ada Lovelace", "Ada", "Lovelace", "Charles Babbage", "ab", "abab",
        "error", "err", "CERN", "Tim Berners-Lee", "a b", "Zelda Fitzroy",
    ]
    rng = random.Random(13)
    words = ["ada", "lovelace", "ada lovelace", "abab", "ab", "x", "err",
             "error", "cern", "the", "err,", "ada_", "tim berners-lee", "a b"]
    cases = ["", "abab", "ab ab", "xabab", "Ada Lovelace met ada", "err error err"]
    cases += [" ".join(rng.choices(words, k=rng.randint(1, 12))) for _ in range(200)]
    cases += ["".join(rng.choices(["ab", "a", "b", " ", ",", "_"], k=rng.randint(1, 20)))
              for _ in range(200)]
    _compare(spark, surfaces, cases)


def test_native_engine_empty_dictionary(spark):
    df = spark.createDataFrame([("anything",), (None,)], "text string")
    got = [r["m"] for r in df.select(
        TX.mention_matches(F.col("text"), [], engine="native").alias("m")
    ).collect()]
    assert got == [[], []]


def test_native_engine_on_synth_transcripts(spark):
    """The exact data shape the driver's gated queries scan."""
    ts = synth.transcripts(spark, n_convs=120, seed=42)
    scan_udf = TX.mention_scan_udf(synth.ALL_MENTION_NAMES, engine="regex")
    bad = (
        ts.select(
            TX.mention_matches(F.col("text"), synth.ALL_MENTION_NAMES, engine="native").alias("nat"),
            scan_udf(F.col("text")).alias("ref"),
        )
        .filter(F.col("nat") != F.col("ref"))
        .count()
    )
    assert bad == 0
