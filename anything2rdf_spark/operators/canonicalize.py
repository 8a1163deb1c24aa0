"""Stage 4: canonicalization (SURVEY §2.10 G1-G2, §2.6 J7, §2.7 A2).

The hard core: connected components over an alias-edges DataFrame via
iterative joins — the distributed re-expression of schoenberg's in-memory
union-find (schoenbergcsv2rdf.scala:105-168: pass-1 min-id map, path
compression, pass-2 substitution + owl:sameAs emission).

Algorithm: min-label propagation with pointer jumping. Each round
(1) every node takes the min component label among itself and its
neighbors, then (2) jumps to its label's label (path compression). Both are
equi-joins; the label distance roughly doubles per round, so a chain of
length L converges in O(log L) rounds — verified in tests on a 1000-node
chain. Every round ends in ``localCheckpoint`` to cut lineage (SURVEY §4.2
custom-work item 1); at cluster scale this would be an Iceberg temp-table
checkpoint instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import NS, OWL_SAMEAS
from .. import iri
from ..schemas import TRIPLE_COLS


def connected_components(
    edges: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    max_iter: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """Edges → canonical map (node_id, canonical_id) with canonical = min id
    of the component (min-id semantics, schoenbergcsv2rdf.scala:135).

    Isolated nodes (self-loops) map to themselves. Deterministic under any
    partitioning. Raises if not converged within ``max_iter`` rounds (a
    10^12-scale run would page instead)."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    parent = nodes.select("node", F.col("node").alias("comp"))
    if checkpoint:
        und = und.localCheckpoint()
        parent = parent.localCheckpoint()

    from pyspark.sql import Observation

    for _ in range(max_iter):
        # (1) neighbor-min: min component label among self and neighbors.
        # The pre-update label rides along as _old so the convergence check
        # needs NO extra join or job.
        nbr = (
            und.join(parent.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        p1 = parent.join(nbr, "node", "left").select(
            "node",
            F.col("comp").alias("_old"),
            F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        # (2) pointer jump: comp := comp(comp)
        lut = p1.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
        p2 = p1.join(lut, "comp", "left").select(
            "node",
            "_old",
            F.least("comp", F.coalesce("comp2", "comp")).alias("comp"),
        )
        # (3) second jump per round (round-6): label distance shrinks ~3x
        # per round instead of ~2x, so a chain of length L converges in
        # ~log3(L) rounds — fewer checkpoint barriers for one extra tiny
        # equi-join per round (total join count is a wash: 3·log3 ≈ 2·log2;
        # measured 12 -> 7 rounds and identical output on the bench graph).
        lut2 = p2.select(F.col("node").alias("comp"), F.col("comp").alias("comp3"))
        p2 = p2.join(lut2, "comp", "left").select(
            "node",
            "_old",
            F.least("comp", F.coalesce("comp3", "comp")).alias("comp"),
        )
        if checkpoint:
            # the changed-count observes the SAME job that materializes the
            # checkpoint — one action per round, not two (per-round jobs are
            # the wall-clock driver of the O(log L) loop at any scale)
            obs = Observation()
            p2o = p2.observe(obs, F.count_if(F.col("comp") != F.col("_old")).alias("chg"))
            parent = p2o.select("node", "comp").localCheckpoint()
            changed = obs.get["chg"]
        else:
            changed = p2.filter(F.col("comp") != F.col("_old")).limit(1).count()
            parent = p2.select("node", "comp")
        if changed == 0:
            return parent.select(F.col("node").alias("node_id"), F.col("comp").alias("canonical_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def sameas_triples(canonical_map: DataFrame, ns: str = NS) -> DataFrame:
    """owl:sameAs canonical→original for every non-root member
    (schoenbergcsv2rdf.scala:168 emits from the canonical id)."""
    return (
        canonical_map.filter(F.col("node_id") != F.col("canonical_id"))
        .select(
            iri.mint("entity", "canonical_id", ns=ns).alias("subj"),
            F.lit(OWL_SAMEAS).alias("pred"),
            iri.mint("entity", "node_id", ns=ns).alias("obj_iri"),
            F.lit(None).cast("string").alias("obj_lit"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
        )
        .select(*TRIPLE_COLS)
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame, broadcast_map: bool = True) -> DataFrame:
    """G2: post-hoc triple rewrite — substitute canonical IRIs everywhere a
    mapped IRI appears as subject or object (PNR2RDF.scala:213-226
    ``replaceMap`` semantics: two passes, subject then object, via two left
    joins + coalesce)."""
    m = mapping.select(F.col("from_iri"), F.col("to_iri"))
    if broadcast_map:
        m = F.broadcast(m)
    out = (
        triples.join(m.withColumnRenamed("from_iri", "subj").withColumnRenamed("to_iri", "_s2"), "subj", "left")
        .withColumn("subj", F.coalesce("_s2", "subj"))
        .drop("_s2")
    )
    out = (
        out.join(m.withColumnRenamed("from_iri", "obj_iri").withColumnRenamed("to_iri", "_o2"), "obj_iri", "left")
        .withColumn("obj_iri", F.coalesce("_o2", "obj_iri"))
        .drop("_o2")
    )
    return out.select(*TRIPLE_COLS)


def canonical_rewrite_map(canonical_map: DataFrame, ns: str = NS) -> DataFrame:
    """canonical map → IRI rewrite map (from_iri, to_iri) for G2."""
    return canonical_map.filter(F.col("node_id") != F.col("canonical_id")).select(
        iri.mint("entity", "node_id", ns=ns).alias("from_iri"),
        iri.mint("entity", "canonical_id", ns=ns).alias("to_iri"),
    )


def degree_constrained_merge(
    edges: DataFrame,
    left_key: str,
    right_key: str,
    left_name: str | None = None,
    right_name: str | None = None,
    partnership_col: str | None = None,
) -> DataFrame:
    """J7: FBTEE's 1:1 client↔person merge decision
    (FBTEETSV2RDF.scala:395-431): merge left into right IFF both degrees are
    exactly 1 AND (names equal when given) AND NOT partnership. Returns the
    edge rows with a boolean ``merge`` column — canonicalization decided via
    two group-degree aggregations (A1) + joins, no row-at-a-time logic."""
    # degree = DISTINCT partner count: the same edge row appearing twice
    # must not make a genuinely 1:1 pair look 1:2 and block its merge
    ldeg = edges.groupBy(left_key).agg(F.countDistinct(right_key).alias("_ldeg"))
    rdeg = edges.groupBy(right_key).agg(F.countDistinct(left_key).alias("_rdeg"))
    out = edges.join(ldeg, left_key).join(rdeg, right_key)
    cond = (F.col("_ldeg") == 1) & (F.col("_rdeg") == 1)
    if left_name and right_name:
        # null-safe: a null name means "names do not match", never a null
        # merge flag (a null would leak through ~merge filters downstream)
        cond = cond & F.coalesce(F.col(left_name) == F.col(right_name), F.lit(False))
    if partnership_col:
        cond = cond & (~F.coalesce(F.col(partnership_col), F.lit(False)))
    return out.withColumn("merge", cond).drop("_ldeg", "_rdeg")


def min_dup_map(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """A2: per-id minimum duplicate id (schoenbergcsv2rdf.scala:135 pass-1
    map before compression)."""
    return edges.groupBy(src).agg(F.min(dst).alias("min_dup"))
