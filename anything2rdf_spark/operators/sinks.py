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


# Turtle PN_LOCAL subset we compact without escaping; anything else keeps
# the full <IRI> form (conservative: valid output either way). PN_LOCAL must
# not END with '.' — a trailing dot would merge with the statement terminator
# ('ex:v1. .' mis-parses) — so the final char class excludes it.
_SAFE_LOCAL = "^[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?$"


def _compact_term(iri_col, prefixes: dict[str, str]):
    """Term-level prefix compaction: ``<ns>local`` → ``pfx:local`` only when
    the local name is PN_LOCAL-safe; bnodes pass through; everything else
    stays ``<iri>``. Compacting at the term (not the rendered line) keeps
    literals that merely *contain* IRI-like text untouched."""
    c = F.col(iri_col) if isinstance(iri_col, str) else iri_col
    expr = F.when(c.startswith("_:"), c)
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(c, len(ns) + 1, 1 << 30)
        expr = expr.when(
            c.startswith(ns) & local.rlike(_SAFE_LOCAL),
            F.concat(F.lit(pfx + ":"), local),
        )
    return expr.otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def _render_lines(triples: DataFrame, term) -> DataFrame:
    """Shared triple-line assembly; ``term`` renders an IRI/bnode column."""
    obj = (
        F.when(F.col("obj_iri").isNotNull(), term("obj_iri"))
        .when(
            F.col("obj_lang").isNotNull(),
            F.concat(F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"@'), F.col("obj_lang")),
        )
        .when(
            F.col("obj_dtype").isNotNull(),
            F.concat(F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"^^'), term("obj_dtype")),
        )
        .otherwise(F.concat(F.lit('"'), _escape_nt(F.col("obj_lit")), F.lit('"')))
    )
    return triples.select(
        F.concat(term("subj"), F.lit(" "), term("pred"), F.lit(" "), obj, F.lit(" .")).alias("line")
        # a malformed triple (all four object columns null — TRIPLE_SCHEMA
        # allows it) concats to a NULL line, and the text datasource rejects
        # null values: one bad row must not fail a whole export job —
        # quarantine upstream, drop here
    ).filter(F.col("line").isNotNull())


def nt_lines(triples: DataFrame) -> DataFrame:
    """K1: N-Triples rendering (RDFDataMgr.write(..., NT),
    OBCXML2RDF.scala:215) — one ``line`` column; object kind dispatched on
    obj_iri XOR obj_lit, language tags and typed literals per spec."""
    return _render_lines(triples, _term)


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
    Compaction happens at the *term* level (longest namespace wins,
    PN_LOCAL-safe locals only) — never on the rendered line, so a literal
    that happens to contain ``<http://ns/x>`` text is left untouched.
    Header ``@prefix`` lines unioned on top.

    .. warning:: Turtle requires a prefix declaration to PRECEDE its first
       use — do not sort or repartition this unioned frame before writing
       (the header lines would interleave into the body). For a valid file
       export use :func:`write_ttl`, which writes the header separately."""
    body = _render_lines(triples, lambda c: _compact_term(c, prefixes))
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{n}> .",) for p, n in prefixes.items()], "line string"
    )
    return header.unionByName(body)


def write_ttl(
    triples: DataFrame, path: str, prefixes: dict[str, str],
    gzip: bool = False, sort: bool = False,
) -> None:
    """K2 file export: the body writes distributed (optionally sorted for
    golden files); the ``@prefix`` header is written as its own part file
    named ``00_prefixes.ttl`` so it sorts FIRST in the output directory —
    concatenating the directory's files in name order is then a conforming
    Turtle document (declarations precede every use), which a sorted union
    of header+body lines is not."""
    import gzip as gz
    import os

    body = _render_lines(triples, lambda c: _compact_term(c, prefixes))
    if sort:
        body = body.orderBy("line")
    w = body.write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)
    header = "".join(f"@prefix {p}: <{n}> .\n" for p, n in prefixes.items())
    if gzip:
        with gz.open(os.path.join(path, "00_prefixes.ttl.gz"), "wt", encoding="utf-8") as f:
            f.write(header)
    else:
        with open(os.path.join(path, "00_prefixes.ttl"), "w", encoding="utf-8") as f:
            f.write(header)


def split_schema_data(triples: DataFrame, schema_ns: str) -> tuple[DataFrame, DataFrame]:
    """K4: two-model split — ontology/schema statements vs instance data
    (PNR2RDF.scala:121-124, 207-227). Schema rows = subjects in the schema
    namespace."""
    is_schema = F.col("subj").startswith(schema_ns)
    return triples.filter(is_schema), triples.filter(~is_schema)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None, mode: str = "overwrite",
    keep_nulls: bool = True,
) -> str:
    """Training-data JSONL export — one JSON object per line, the
    interchange format LLM data pipelines exchange (every public corpus
    release — C4, The Pile, RefinedWeb, Dolma — ships as (gzipped) JSONL
    shards. One native ``to_json(struct(*))`` projection into the text
    writer: scan-local, one file per partition (repartition upstream to
    choose the shard count), ``compression='gzip'`` for .gz shards.
    Returns ``path``. Read back with ``spark.read.json(path)``.

    ``keep_nulls`` (default True) overrides Spark's to_json default of
    DROPPING null-valued keys — without it an all-null column vanishes
    from every line, read-back schema inference loses the column, and the
    promised round-trip breaks on the first ``select`` of it."""
    out = df.select(
        F.to_json(
            F.struct(*[F.col(c) for c in df.columns]),
            {"ignoreNullFields": "false"} if keep_nulls else {},
        ).alias("value")
    )
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)
    return path
