"""Hierarchy operators (SURVEY G4, G5, A5, E6): nested/recursive structures
decomposed with bounded iterative DataFrame passes — never driver-side
recursion over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import RDFS_SUBCLASSOF
from ..schemas import TRIPLE_COLS


def flatten_tree(
    df: DataFrame,
    id_col: str = "id",
    children_col: str = "children",
    max_depth: int = 32,
) -> DataFrame:
    """G4: recursive nested-record decomposition (grandtourjson2rdf.scala:57-94
    ``processCity`` over JSON ``children``) as an iterative explode with a
    parent accumulator. Returns (id, parent_id, depth, node) where node is
    the struct minus its children.

    Each round explodes one level; terminates when a level is empty (or
    max_depth as a runaway guard). Depth-bounded loops are the Spark shape
    for recursion: real document trees are shallow, so this is O(depth)
    narrow stages, not O(nodes) driver calls.
    """
    level = df.select(
        F.col(id_col).alias("id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit(0).alias("depth"),
        F.struct(*[c for c in df.columns if c != children_col]).alias("node"),
        F.col(children_col).alias("_kids"),
    )
    out = level.drop("_kids")
    for depth in range(1, max_depth + 1):
        kids = level.filter(F.size("_kids") > 0).select(
            F.col("id").alias("parent_id"), F.explode("_kids").alias("_k"), F.lit(depth).alias("depth")
        )
        if kids.isEmpty():
            break
        has_kids = "children" in [f.name for f in kids.schema["_k"].dataType.fields]
        level = kids.select(
            F.col(f"_k.{'id'}").alias("id"),
            "parent_id",
            "depth",
            F.struct(*[F.col(f"_k.{f.name}") for f in kids.schema["_k"].dataType.fields if f.name != "children"]).alias("node"),
            (F.col("_k.children") if has_kids else F.array().cast("array<struct<id:string>>")).alias("_kids"),
        )
        out = out.unionByName(level.drop("_kids"), allowMissingColumns=True)
        if not has_kids:
            break
    return out


def rollup_content(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    content_col: str = "content",
    max_depth: int = 32,
) -> DataFrame:
    """A5: content rollup over a hierarchy (FinlexXML2RDF.scala:218-227
    ``completeContent`` accumulation): each node's complete content = its own
    + all descendants', ordered by id. Implemented by propagating each
    node's content up to every ancestor via iterative parent joins (depth-
    bounded), then grouping per ancestor."""
    edges = nodes.select(F.col(id_col).alias("child"), F.col(parent_col).alias("anc")).filter(
        F.col("anc").isNotNull()
    )
    # transitive closure by iterated join (bounded by tree depth)
    closure = edges
    frontier = edges
    for _ in range(max_depth):
        step = edges.withColumnRenamed("anc", "anc2").withColumnRenamed("child", "anc")
        nxt = (
            frontier.join(step, "anc")
            .select(F.col("child"), F.col("anc2").alias("anc"))
            .exceptAll(closure)
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint()
        frontier = nxt
    contrib = closure.unionByName(
        nodes.select(F.col(id_col).alias("child"), F.col(id_col).alias("anc"))
    )
    return (
        contrib.join(
            nodes.select(F.col(id_col).alias("child"), F.col(content_col).alias("_c")), "child"
        )
        .groupBy(F.col("anc").alias(id_col))
        .agg(
            F.concat_ws(
                "\n", F.array_sort(F.collect_list(F.struct("child", "_c"))).getField("_c")
            ).alias("complete_content")
        )
    )


def dynamic_subclass_triples(values: DataFrame, value_col: str, parent_class: str) -> DataFrame:
    """E6: dynamic subclass minting per distinct row value
    (EMLOCSV2RDF.scala:264-265: a class per work-type, subClassOf the static
    parent)."""
    from .. import iri

    return (
        values.select(F.col(value_col)).distinct()
        .select(
            iri.schema_class_iri(value_col).alias("subj"),
            F.lit(RDFS_SUBCLASSOF).alias("pred"),
            F.lit(parent_class).alias("obj_iri"),
            F.lit(None).cast("string").alias("obj_lit"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
        )
        .select(*TRIPLE_COLS)
    )


def consistency_check(df: DataFrame, forbidden: DataFrame, on: list[str]) -> None:
    """P8: runtime consistency assertion (eecsv2rdf.scala:92-99) — abort the
    job when a forbidden edge appears. Set-at-a-time: one semi-join instead
    of a per-row check."""
    bad = df.join(forbidden, on, "left_semi")
    n = bad.limit(1).count()
    if n:
        rows = [tuple(r) for r in bad.limit(5).collect()]
        raise ValueError(f"consistency check failed; offending rows: {rows}")
