"""Corpus-curation composition: the standard training-data filter chain —
exact dedup → language filter → quality threshold → PII scrub → token
accounting — as ONE declarative DataFrame transformation.

Every component is an individually oracle-gated operator (dedupe.
exact_duplicates semantics, textstats.lang_id / quality_score / redact_pii /
ws_token_count); this module proves they COMPOSE, the training-data analog
of the KG pipeline's staged composition gate.

Plan at scale: dedup is one window over the content hash (the chain's only
shuffle); language ID, quality, PII masking, and token counts are
scan-local native expressions on the surviving rows — the whole chain is
one pass + one shuffle at any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .dedupe import normalized_text
from .textstats import lang_id, quality_score, redact_pii, ws_token_count


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: Sequence[str] | None = ("en",),
    min_quality: float = 0.0,
    dedup: bool = True,
) -> DataFrame:
    """Curate a document corpus for training-data use. Returns one row per
    SURVIVING document: (doc_id, lang_guess, quality, ws_tokens,
    clean_text).

    * ``dedup``: keep only the min-id document per normalized content hash
      (exact_duplicates' canonical rule, computed inline as one window so
      no join is needed).
    * ``langs``: keep documents whose ``lang_id`` guess is in the set
      (``None`` keeps all languages).
    * ``min_quality``: threshold on ``quality_score`` rounded to 6 decimals
      (rounded BEFORE filtering so the cut is engine-portable).
    * ``clean_text``: ``redact_pii`` output (email/IP/Luhn-card/phone).
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    if dedup:
        w = W.partitionBy(F.sha2(normalized_text("text"), 256))
        d = (
            d.withColumn("_canon", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("_canon"))
            .drop("_canon")
        )
    d = d.withColumn("lang_guess", lang_id("text"))
    if langs is not None:
        d = d.filter(F.col("lang_guess").isin(list(langs)))
    d = d.withColumn("quality", F.round(quality_score("text"), 6))
    if min_quality > 0.0:
        d = d.filter(F.col("quality") >= min_quality)
    return d.select(
        "doc_id",
        "lang_guess",
        "quality",
        ws_token_count("text").alias("ws_tokens"),
        redact_pii("text").alias("clean_text"),
    )
