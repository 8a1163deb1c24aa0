"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: native ``zip_with`` dot
  products (JVM, codegen) after broadcasting the (small) query set; the
  correctness baseline and perfectly adequate when |queries| is modest.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets the corpus
  once (a narrow map), queries probe only their own bucket(s); exact
  re-rank inside the bucket. At 100 TB the corpus signature is computed in
  the same scan that wrote the embeddings, and the join is bucket-to-bucket
  instead of corpus×queries.
* ``embedding_neardup_pairs`` — cosine near-duplicate pairs via the same
  bucketing (self-join within buckets).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries, one narrow pass over the
    corpus, per-query top-k via window. Returns
    (query_id, vec_id, cosine_sim, rank)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), _norm(F.col(vec_col)).alias("_qn")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cn")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        (_dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cn") * F.col("_qn"))).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded numpy — same planes every
    run, any parallelism)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature under the given hyperplanes → bigint bucket key.
    Native exprs: one zip_with dot product per plane."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(_dot(v, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signature,
    score only within the shared bucket, exact re-rank. Recall < 1 by
    construction; raise bucket recall with fewer planes or multi-probe."""
    from pyspark.sql import Window as W

    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    csig = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), lsh_signature(vec_col, planes).alias("_b")
    )
    qsig = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), lsh_signature(vec_col, planes).alias("_b")
    )
    scored = csig.join(F.broadcast(qsig), "_b").select(
        query_id_col,
        id_col,
        (
            _dot(F.col("_cvec"), F.col("_qvec"))
            / (_norm(F.col("_cvec")) * _norm(F.col("_qvec")))
        ).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    LSH-bucketed self-join — candidates only within a bucket, then exact
    cosine filter."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), lsh_signature(vec_col, planes).alias("b")
    )
    return (
        sig.alias("l")
        .join(sig.alias("r"), (F.col("l.b") == F.col("r.b")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            (
                _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
