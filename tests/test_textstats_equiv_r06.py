"""Round-6 optimization guards: the one-pass rewrites of lang_id and
quality_score (operators/textstats.py) must be value-identical to the
round-5 formulations on adversarial inputs — nulls, empties, ties,
mixed-script text, shared stopwords.

The old formulations are embedded here verbatim as the reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators.textstats import (
    SCRIPT_CLASSES,
    SCRIPT_LANGS,
    STOPWORDS,
    lang_id,
    quality_score,
    script_counts,
    script_lang_scores,
    stopword_hits,
    ws_token_count,
)


def _lang_id_r5(text):
    """Round-5 lang_id: per-language re-tokenization + duplicated argmax."""
    s = script_counts(text)
    n_script = sum([s[name] for name, _, _ in SCRIPT_CLASSES[1:]], s[SCRIPT_CLASSES[0][0]])
    lang_scores = script_lang_scores(s)
    script_best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-lang_scores[code]).cast("long").alias("neg_hits"),
                    F.lit(code).alias("lang"),
                )
                for code in SCRIPT_LANGS
            ]
        )
    )
    scores = F.array(
        *[
            F.struct(
                (-stopword_hits(text, lang)).alias("neg_hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_min(scores)
    stop_lang = F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))
    return F.when(n_script * 2 > s["letters"], script_best["lang"]).otherwise(stop_lang)


def _quality_r5(text):
    """Round-5 quality_score: flat CASE arms re-inlining every statistic."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    n_tokens = ws_token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = stopword_hits(t, "en")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), 1.0).otherwise(0.25)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.6)
    wl_ok = F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), 1.0).otherwise(0.5)
    return 0.4 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wl_ok


FIXTURES = [
    None,
    "",
    "   ",
    "123 456 !!",
    "the and of to a in is with for on",  # pure en stopwords
    "la la la",  # shared fr/es stopword: tie must break to 'es' < 'fr'? (code order)
    "en on en on",  # 'en' in es/nl/sv, 'on' in en/fi — cross-language multiset
    "de het een van en dat niet voor met zijn",  # nl
    "och att det som en på är av för inte",  # sv
    "ve bir bu için ile olarak da ne gibi çok",  # tr (non-ascii letters)
    "i nie to się na że jest do z jak",  # pl
    "word " * 200,  # long, no stopwords -> 'und'
    "The quick brown fox jumps over the lazy dog and runs on.",
    "こんにちは世界",  # ja: kana + han
    "你好世界你好",  # zh: pure han
    "안녕하세요 세계",  # ko
    "مرحبا بالعالم",  # ar
    "привет мир",  # ru
    "γεια σου κόσμε",  # el
    "hello 世界 the and of the in is",  # latin-majority with CJK quote
    "世界世界世界 the",  # script-majority with latin tail
    "١٢٣",  # arabic-indic digits: script chars, zero letters
    "a. b! c? d; e: f,",
    "tab\tand\nnewline  runs",
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame([(t,) for t in FIXTURES], "text string")


def test_lang_id_matches_r5_formulation(fixture_df):
    rows = fixture_df.select(
        "text",
        lang_id("text").alias("new"),
        _lang_id_r5("text").alias("old"),
    ).collect()
    for r in rows:
        assert r.new == r.old, f"lang_id drift on {r.text!r}: {r.new} != {r.old}"


def test_quality_matches_r5_formulation(fixture_df):
    rows = fixture_df.select(
        "text",
        F.round(quality_score("text"), 6).alias("new"),
        F.round(_quality_r5("text"), 6).alias("old"),
    ).collect()
    for r in rows:
        assert r.new == r.old, f"quality drift on {r.text!r}: {r.new} != {r.old}"


def test_lang_id_matches_r5_on_sf_documents(spark):
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = (
        docs.select(
            lang_id("text").alias("new"),
            _lang_id_r5("text").alias("old"),
            F.round(quality_score("text"), 6).alias("qnew"),
            F.round(_quality_r5("text"), 6).alias("qold"),
        )
        .filter((F.col("new") != F.col("old")) | (F.col("qnew") != F.col("qold")))
        .count()
    )
    assert bad == 0
