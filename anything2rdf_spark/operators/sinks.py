"""Sinks (SURVEY §2.2 K1-K4): RDF serializations rendered as native column
expressions + distributed text writes. The Iceberg/parquet triple tables are
the system of record; these are export formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _escape_nt(c):
    """N-Triples literal escaping: backslash, quote, newline, tab, CR."""
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    return F.regexp_replace(out, "\t", "\\\\t")


def _term(iri_col):
    """IRI or blank-node rendering (bnode labels pass through unwrapped)."""
    c = F.col(iri_col) if isinstance(iri_col, str) else iri_col
    return F.when(c.startswith("_:"), c).otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def nt_lines(triples: DataFrame) -> DataFrame:
    """K1: N-Triples rendering (RDFDataMgr.write(..., NT),
    OBCXML2RDF.scala:215) — one ``line`` column; object kind dispatched on
    obj_iri XOR obj_lit, language tags and typed literals per spec."""
    obj = (
        F.when(F.col("obj_iri").isNotNull(), _term("obj_iri"))
        .when(
            F.col("obj_lang").isNotNull(),
            F.concat(F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"@'), F.col("obj_lang")),
        )
        .when(
            F.col("obj_dtype").isNotNull(),
            F.concat(
                F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"^^<'), F.col("obj_dtype"), F.lit(">")
            ),
        )
        .otherwise(F.concat(F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"')))
    )
    return triples.select(
        F.concat(_term("subj"), F.lit(" "), _term("pred"), F.lit(" "), obj, F.lit(" .")).alias("line")
    )


def write_nt(triples: DataFrame, path: str, gzip: bool = False, sort: bool = False) -> None:
    """K1/K3: distributed N-Triples write; ``gzip=True`` is the streaming
    gzip sink analog (VIAFXML2RDF.scala:51-52) — parallel writers instead of
    one locked stream. ``sort=True`` gives the deterministic golden-file
    ordering (SURVEY §2.9)."""
    lines = nt_lines(triples)
    if sort:
        lines = lines.orderBy("line")
    w = lines.write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)


def ttl_lines(triples: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """K2: Turtle rendering with prefix compaction (EMLOCSV2RDF.scala:606-613).
    Prefix map applied longest-first via chained replace; header lines
    unioned on top."""
    lines = nt_lines(triples)
    out = F.col("line")
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        out = F.replace(out, F.lit(f"<{ns}"), F.lit(f"{pfx}:<"))
        out = F.regexp_replace(out, rf"{pfx}:<([^>]*)>", rf"{pfx}:$1")
    body = lines.select(out.alias("line"))
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{n}> .",) for p, n in prefixes.items()], "line string"
    )
    return header.unionByName(body)


def split_schema_data(triples: DataFrame, schema_ns: str) -> tuple[DataFrame, DataFrame]:
    """K4: two-model split — ontology/schema statements vs instance data
    (PNR2RDF.scala:121-124, 207-227). Schema rows = subjects in the schema
    namespace."""
    is_schema = F.col("subj").startswith(schema_ns)
    return triples.filter(is_schema), triples.filter(~is_schema)
