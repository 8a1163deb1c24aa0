"""P5: fully-dynamic per-column dispatch — the reference's giant per-column
``match`` (schoenbergcsv2rdf.scala:180-286; ceectsv2rdf.scala:154-178) as a
melt + rules join.

Melting every column into (row_key, col_name, value) rows turns per-column
code into per-row data: a broadcast rules table decides predicate/type per
column name, with a generic fallback rule that mints a datatype property
from the column name itself and converts Y/N to booleans
(ceectsv2rdf.scala:176-177) — schema evolution without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import XSD_BOOLEAN
from .. import iri
from ..functions.text import yn_bool
from ..schemas import TRIPLE_COLS


def melt(df: DataFrame, key_cols: list[str], value_cols: list[str] | None = None) -> DataFrame:
    """Wide → long: (key_cols..., col_name, value). Native ``stack``.

    Column names are backtick-quoted and embedded name literals escaped —
    arbitrary CSV headers (spaces, quotes, dots, even backticks) are exactly
    the inputs this operator exists for, and raw interpolation into
    selectExpr would mis-parse or struct-resolve them."""
    value_cols = value_cols or [c for c in df.columns if c not in key_cols]

    def bq(c: str) -> str:  # identifier: backticks doubled inside backticks
        return "`" + c.replace("`", "``") + "`"

    def sq(c: str) -> str:  # string literal: single quotes doubled
        return "'" + c.replace("'", "''") + "'"

    pairs = ", ".join(f"{sq(c)}, cast({bq(c)} AS string)" for c in value_cols)
    return df.selectExpr(
        *[bq(c) for c in key_cols],
        f"stack({len(value_cols)}, {pairs}) AS (col_name, value)",
    )


def generic_column_triples(
    df: DataFrame,
    key_cols: list[str],
    subject_expr,
    rules: DataFrame | None = None,
    ns: str | None = None,
) -> DataFrame:
    """Melted rows → triples.

    ``rules`` (optional broadcast dim): (col_name, pred_iri, obj_dtype) maps
    known columns to predicates; unmatched columns take the generic fallback:
    predicate minted from the column name (``EDP(k)``,
    ceectsv2rdf.scala:154-178), Y/N values emitted as xsd:boolean.
    """
    from .. import NS as DEFAULT_NS

    ns = ns or DEFAULT_NS
    long = melt(df, key_cols).filter(F.col("value").isNotNull() & (F.trim("value") != ""))
    if rules is not None:
        long = long.join(F.broadcast(rules), "col_name", "left")
    else:
        long = long.withColumn("pred_iri", F.lit(None).cast("string")).withColumn(
            "obj_dtype", F.lit(None).cast("string")
        )
    pred = F.coalesce(F.col("pred_iri"), iri.schema_prop_iri("col_name"))
    # Y/N boolean coercion belongs to the generic FALLBACK only
    # (ceectsv2rdf.scala:176-177): a rule-matched column keeps its declared
    # dtype — a value 'N' in a mapped string column is the literal 'N'
    is_yn = F.col("value").isin("Y", "N") & F.col("pred_iri").isNull()
    return long.select(
        subject_expr.alias("subj"),
        pred.alias("pred"),
        F.lit(None).cast("string").alias("obj_iri"),
        F.when(is_yn, yn_bool("value").cast("string")).otherwise(F.col("value")).alias("obj_lit"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.when(is_yn, F.lit(XSD_BOOLEAN)).otherwise(F.col("obj_dtype")).alias("obj_dtype"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    ).select(*TRIPLE_COLS)


def label_set_dedup(df: DataFrame, key: str, pref_col: str, alt_col: str) -> DataFrame:
    """A4: set-dedup of labels — altLabels dropped when already prefLabels
    (VIAFXML2RDF.scala:143-144, 180-181): collect_set + array_except."""
    return df.groupBy(key).agg(
        F.collect_set(pref_col).alias("pref_labels"),
        F.array_except(F.collect_set(alt_col), F.collect_set(pref_col)).alias("alt_labels"),
    )
