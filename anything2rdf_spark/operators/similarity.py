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
    order_round: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries, one narrow pass over the
    corpus, per-query top-k via window. Returns
    (query_id, vec_id, cosine_sim, rank). ``order_round`` ranks on the
    rounded similarity (ties broken by id) — makes the rank reproducible
    across engines/summation orders for verification runs."""
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
    key = F.col("cosine_sim") if order_round is None else F.round("cosine_sim", order_round)
    w = W.partitionBy(query_id_col).orderBy(F.desc(key), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded numpy — same planes every
    run, any parallelism)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def grid_planes(dim: int, n_planes: int = 8) -> list[list[int]]:
    """Deterministic small-integer hyperplanes from a closed-form grid:
    ``w[j][d] = ((1 + (3 + 2*j)*d + 7*j) % 11) - 5`` ∈ {-5..5}.
    Engine-portable — any SQL engine can regenerate them — and integer, so
    the signature computed over quantized vectors is EXACT (no
    float-associativity drift between engines). Used by the driver's
    oracle-checked LSH queries; production runs keep the gaussian
    ``hyperplanes``.

    The per-plane slope ``(3 + 2*j) % 11`` is distinct for every j < 11, so
    no two planes are equal or cyclic shifts of each other (the earlier
    ``% 7`` formula made plane j+7 identical to plane j and every plane a
    shift of one period-7 sequence — correlated buckets)."""
    if n_planes > 11:
        raise ValueError("grid_planes supports at most 11 distinct planes (mod-11 slopes)")
    return [
        [((1 + (3 + 2 * j) * d + 7 * j) % 11) - 5 for d in range(dim)]
        for j in range(n_planes)
    ]


def lsh_signature_grid(vec_col, dim: int, n_planes: int = 8, scale: int = 1000):
    """Sign-bit signature over grid_planes with integer-exact arithmetic:
    the vector is quantized to ``round(x*scale)`` longs, each plane dot
    product is an integer fold (order-independent), sign → bit. Bit-for-bit
    reproducible in any engine."""
    from .textstats import _let

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    # quantized vector let-bound once (round-6): the flat form re-ran the
    # quantization transform once per plane
    def _sig(q):
        sig = F.lit(0).cast("long")
        for j, plane in enumerate(grid_planes(dim, n_planes)):
            warr = F.array(*[F.lit(w).cast("long") for w in plane])
            dot = F.aggregate(
                F.zip_with(q, warr, lambda x, w: x * w),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            )
            sig = sig + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0).cast("long"))
        return sig

    return _let(F.transform(v, lambda x: F.round(x * scale, 0).cast("long")), _sig)


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
    signature: str = "gauss",
    order_round: int | None = None,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signature,
    score only within the shared bucket, exact re-rank. Recall < 1 by
    construction; raise bucket recall with fewer planes or multi-probe.

    Pass ``dim`` explicitly in pipelines (the ``None`` fallback runs a
    driver-side ``first()`` job). ``signature='grid'`` uses the
    engine-portable integer signature (lsh_signature_grid).
    ``multi_probe=1`` additionally probes every bucket at Hamming distance 1
    from the query's signature (n_planes extra buckets per query — queries
    are the broadcast side, so the fan-out is dimension-sized): the standard
    recall/probe-cost dial (Lv et al., multi-probe LSH, VLDB'07).
    ``multi_probe=2`` adds the distance-2 buckets too (n_planes choose 2
    more — still dimension-sized on the broadcast side); its candidate set
    strictly contains the distance-1 set, so recall is monotone in the
    probe radius."""
    from pyspark.sql import Window as W

    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    if multi_probe not in (0, 1, 2):
        raise ValueError(
            "multi_probe supports 0 (exact bucket), 1 (1-bit flips), or 2 (+2-bit flips)"
        )
    sig_expr = (
        lsh_signature_grid(vec_col, dim, n_planes)
        if signature == "grid"
        else lsh_signature(vec_col, hyperplanes(dim, n_planes, seed))
    )
    # norms are hoisted per ROW before the join (as cosine_topk does): a
    # corpus row matched by m probes would otherwise re-run the O(dim) norm
    # aggregate m times per side
    csig = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), sig_expr.alias("_b"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    qsig = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), sig_expr.alias("_sig"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    masks: list[int] = []
    if multi_probe >= 1:
        masks += [1 << j for j in range(n_planes)]
    if multi_probe >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    if masks:
        # all masks are distinct, so the probe values are distinct and each
        # (query, corpus) pair joins at most once — no post-join dedup
        probes = F.array(
            F.col("_sig"), *[F.col("_sig").bitwiseXOR(F.lit(m)) for m in masks]
        )
        qsig = qsig.select(query_id_col, "_qvec", "_qn", F.explode(probes).alias("_b"))
    else:
        qsig = qsig.withColumnRenamed("_sig", "_b")
    scored = csig.join(F.broadcast(qsig), "_b").select(
        query_id_col,
        id_col,
        (
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cn") * F.col("_qn"))
        ).alias("cosine_sim"),
    )
    key = F.col("cosine_sim") if order_round is None else F.round("cosine_sim", order_round)
    w = W.partitionBy(query_id_col).orderBy(F.desc(key), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cap_buckets(df: DataFrame, bucket_cols: list[str], max_bucket: int) -> DataFrame:
    """Drop every row whose bucket holds more than ``max_bucket`` rows — the
    hot-bucket guard for LSH self-joins: a degenerate bucket (near-identical
    corpus, too few planes) makes the within-bucket self-join quadratic in
    that one bucket. Implemented as a partial-aggregated bucket count
    (map-side combine → the shuffled relation is one row per bucket, not the
    data) + broadcast anti-join of the few oversized keys — deliberately NOT
    a count-window over the bucket, which would buffer the hot bucket's rows
    in a single window partition (the very skew being guarded). Dropping a
    bucket loses its candidate pairs by design — the remedy for a
    persistently hot bucket is more planes, not a bigger cap; use
    ``oversized_buckets`` to see what a cap would drop."""
    hot = oversized_buckets(df, bucket_cols, max_bucket).select(*bucket_cols)
    return df.join(F.broadcast(hot), bucket_cols, "left_anti")


def oversized_buckets(df: DataFrame, bucket_cols: list[str], max_bucket: int) -> DataFrame:
    """The buckets (with row counts) that ``cap_buckets`` would drop —
    dimension-sized; count/collect it to log the drop decision."""
    return (
        df.groupBy(*bucket_cols)
        .agg(F.count("*").alias("bucket_rows"))
        .filter(F.col("bucket_rows") > max_bucket)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    signature: str = "gauss",
    max_bucket: int | None = 100_000,
    log_dropped: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) via
    LSH-bucketed self-join — candidates only within a bucket, then exact
    cosine filter. Pass ``dim`` explicitly in pipelines.

    ``max_bucket`` guards the self-join against a degenerate hot bucket
    (quadratic in bucket size): rows in buckets above the cap are excluded
    from pairing (``None`` disables). ``log_dropped`` runs one small extra
    job to log the dropped buckets.

    When ``max_bucket`` is set the signature table is persisted (it feeds
    the count, anti-join, and both self-join sides); the handle is attached
    to the returned DataFrame — call :func:`release_persisted` on the result
    after materializing it, or the cached blocks live until GC in a
    long-lived session."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig_expr = (
        lsh_signature_grid(vec_col, dim, n_planes)
        if signature == "grid"
        else lsh_signature(vec_col, hyperplanes(dim, n_planes, seed))
    )
    sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig_expr.alias("b"),
        _norm(F.col(vec_col)).alias("n"),
    )
    if max_bucket is not None:
        # one materialization feeds the bucket count, the anti-join, and
        # both sides of the self-join — without it the per-row signature
        # scan recomputes up to 4x (count + log + left + right)
        sig = sig.persist()
        if log_dropped:
            import logging

            dropped = oversized_buckets(sig, ["b"], max_bucket).collect()
            if dropped:
                logging.getLogger(__name__).warning(
                    "embedding_neardup_pairs: dropping %d oversized bucket(s) "
                    "(max_bucket=%d): %s",
                    len(dropped), max_bucket,
                    [(r["b"], r["bucket_rows"]) for r in dropped[:10]],
                )
        capped = cap_buckets(sig, ["b"], max_bucket)
    else:
        capped = sig
    pairs = (
        capped.alias("l")
        .join(capped.alias("r"), (F.col("l.b") == F.col("r.b")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            (
                _dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    if max_bucket is not None:
        pairs._persisted_deps = [sig]  # released via release_persisted(pairs)
    return pairs


def release_persisted(df: DataFrame) -> DataFrame:
    """Unpersist cached dependency DataFrames an operator in this module
    attached to its result (e.g. the signature table
    ``embedding_neardup_pairs`` persists when ``max_bucket`` is set). Call
    AFTER the result has been materialized (collected / written) — earlier
    and the cache is simply rebuilt on next use. No-op for DataFrames
    without attached deps; returns ``df`` for chaining.

    MUST be called on the EXACT DataFrame object the operator returned,
    BEFORE any further transformation: ``_persisted_deps`` is a Python
    attribute, and every filter/select/join returns a NEW DataFrame without
    it, silently leaking the persisted table for the session lifetime
    (r5 ADVICE). Pattern: keep a handle to the raw result, chain off a
    separate variable, release the handle when done."""
    for dep in getattr(df, "_persisted_deps", []):
        dep.unpersist()
    return df


# --- IVF (inverted-file) ANN: coarse spherical-kmeans quantizer ------------


def quantize_vec(vec_col, scale: int = 1000):
    """array<double> → array<long> via ``round(x*scale)`` — the integer-exact
    vector used by the engine-portable IVF/LSH paths.

    Tie-breaking caveat: ``x*scale`` CAN land exactly on .5 in IEEE doubles
    (``0.0005*1000 == 0.5`` exactly), and engines disagree on halves —
    Spark's round() and DuckDB's both round half away from zero (which is
    why the oracle gates are bit-exact), but a banker's-rounding engine
    (numpy, Python round, Postgres float8) would quantize such components
    one off. Porting the oracle to one of those needs an explicit
    half-away-from-zero shim, e.g. ``sign(x)*floor(abs(x)*scale + 0.5)``."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(v, lambda x: F.round(x * scale, 0).cast("long"))


def _centroid_scores_int(vec_col, centroids: list[list[int]], scale: int):
    """Engine-portable centroid scores: array<struct<negscore,j>> where
    score_j = dot(qv, c_j) / sqrt(|c_j|²) — cosine up to the row-constant
    |qv| factor, so argmin(negscore) is the nearest centroid. dot and |c|²
    are exact integers (< 2^53), the division/sqrt are identical IEEE ops in
    any engine → assignments are bit-for-bit reproducible."""
    from .textstats import _let

    # quantized vector let-bound once (round-6): the flat form re-ran the
    # quantization transform once per centroid
    def _scores(qv):
        entries = []
        for j, c in enumerate(centroids):
            warr = F.array(*[F.lit(int(x)).cast("long") for x in c])
            dot = F.aggregate(
                F.zip_with(qv, warr, lambda x, w: x * w),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            )
            normsq = sum(int(x) * int(x) for x in c) or 1
            score = dot.cast("double") / F.sqrt(F.lit(float(normsq)))
            entries.append(F.struct((-score).alias("negscore"), F.lit(j).alias("j")))
        return F.array(*entries)

    return _let(quantize_vec(vec_col, scale), _scores)


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """array<struct<negdot,j>> of negative dot products against each
    (unit-norm) centroid — array_min picks the best cluster; array_sort +
    slice picks the top-nprobe."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array(
        *[
            F.struct(
                (-_dot(v, F.array(*[F.lit(float(x)) for x in c]))).alias("negdot"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(centroids)
        ]
    )


def ivf_train(
    df: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int | None = None,
) -> list[list[float]] | list[list[int]]:
    """Train the IVF coarse quantizer: spherical k-means with deterministic
    init (the nlist smallest ids) and ``iters`` Lloyd rounds, each one
    DataFrame aggregation. Centroids are dimension-sized → they live on the
    driver and broadcast into the assignment expression; the corpus is
    never collected. At 100 TB: train on a sampled slice, assign the full
    corpus in one narrow pass, partition the index by cluster id.

    ``quantize_scale`` switches to the engine-portable integer variant
    (pass the same value to :func:`ivf_topk`): vectors quantize to
    ``round(x*scale)`` longs, centroids are the *unnormalized* integer sums
    per cluster (cosine assignment is scale-invariant, so skipping the
    normalization changes nothing), and every sum is an exact integer —
    order-independent, hence bit-identical in any engine. Used by the
    driver's oracle-checked ``sim_ivf_recall``; production runs keep the
    float path."""
    import math

    if quantize_scale is not None:
        seed_rows = (
            df.orderBy(id_col).limit(nlist).select(quantize_vec(vec_col, quantize_scale)).collect()
        )
        # fewer rows than nlist: clamp — the indexing below iterates
        # range(nlist) and would IndexError past the seeded prefix
        nlist = min(nlist, len(seed_rows))
        if nlist == 0:
            raise ValueError("ivf_train: empty corpus")
        icentroids: list[list[int]] = [[int(x) for x in r[0]] for r in seed_rows]
        for _ in range(iters):
            assigned = df.select(
                F.array_min(_centroid_scores_int(vec_col, icentroids, quantize_scale))["j"].alias("cluster"),
                quantize_vec(vec_col, quantize_scale).alias("qv"),
            )
            sums = (
                assigned.select("cluster", F.posexplode("qv").alias("d", "x"))
                .groupBy("cluster", "d")
                .agg(F.sum("x").alias("s"))
                .collect()
            )
            iby: dict[int, dict[int, int]] = {}
            for r in sums:
                iby.setdefault(r["cluster"], {})[r["d"]] = int(r["s"])
            dim = len(icentroids[0])
            icentroids = [
                [iby[c].get(d, 0) for d in range(dim)] if c in iby else icentroids[c]
                for c in range(nlist)
            ]
        return icentroids

    def _unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    seed_rows = df.orderBy(id_col).limit(nlist).select(vec_col).collect()
    nlist = min(nlist, len(seed_rows))
    if nlist == 0:
        raise ValueError("ivf_train: empty corpus")
    centroids = [_unit([float(x) for x in r[0]]) for r in seed_rows]
    for _ in range(iters):
        assigned = df.select(
            F.array_min(_centroid_scores(vec_col, centroids))["j"].alias("cluster"),
            F.col(vec_col).alias("v"),
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["s"]
        dim = len(centroids[0])
        centroids = [
            _unit([by_cluster[c].get(d, 0.0) for d in range(dim)])
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its old centroid
            for c in range(nlist)
        ]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]] | list[list[int]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    order_round: int | None = None,
    quantize_scale: int | None = None,
) -> DataFrame:
    """IVF ANN top-k: corpus rows live in their nearest-centroid list;
    each query probes its ``nprobe`` nearest lists; exact cosine re-rank
    inside the probed lists. ``nprobe == nlist`` degenerates to the exact
    brute-force result (test-enforced). The corpus side is one narrow
    assignment pass — at scale the inverted lists are the partition/bucket
    key, so a probe touches nprobe/nlist of the data.

    ``quantize_scale`` selects the engine-portable integer scoring for
    centroids trained with the same ``ivf_train(quantize_scale=...)`` —
    cluster assignment and probe order are then bit-identical across
    engines (the re-rank cosine stays on the original float vectors)."""
    from pyspark.sql import Window as W

    def scores(col):
        if quantize_scale is not None:
            return _centroid_scores_int(col, centroids, quantize_scale)
        return _centroid_scores(col, centroids)

    # norms hoisted per row before the join (a corpus row in a probed list
    # is re-scored once per probing query otherwise)
    csig = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        F.array_min(scores(vec_col))["j"].alias("_cl"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    probes = F.transform(
        F.slice(F.array_sort(scores(vec_col)), 1, nprobe),
        lambda s: s["j"],
    )
    qsig = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"),
        _norm(F.col(vec_col)).alias("_qn"), F.explode(probes).alias("_cl"),
    )
    scored = csig.join(F.broadcast(qsig), "_cl").select(
        query_id_col,
        id_col,
        (
            _dot(F.col("_cvec"), F.col("_qvec")) / (F.col("_cn") * F.col("_qn"))
        ).alias("cosine_sim"),
    )
    key = F.col("cosine_sim") if order_round is None else F.round("cosine_sim", order_round)
    w = W.partitionBy(query_id_col).orderBy(F.desc(key), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --- PQ (product quantization) ANN: subspace codebooks + ADC scan ----------


def _l2_int(sv, code: list[int]):
    """Exact integer squared-L2 distance between a quantized subvector
    column and a literal integer codeword."""
    ca = F.array(*[F.lit(int(x)).cast("long") for x in code])
    return F.aggregate(
        F.zip_with(sv, ca, lambda x, w: (x - w) * (x - w)),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )


def _pq_best_code(sv, codes: list[list[int]]):
    """argmin codeword index for a subvector: lexicographic min over
    (dist, code) structs — ties break on the lower code, matching the
    oracle's row_number ORDER BY dist, code."""
    entries = [
        F.struct(_l2_int(sv, code).alias("dist"), F.lit(c).alias("code"))
        for c, code in enumerate(codes)
    ]
    return F.array_min(F.array(*entries))["code"]


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
    dim: int | None = None,
) -> list[list[list[int]]]:
    """Train product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search", TPAMI): split each vector
    into ``m`` contiguous subvectors of dim/m components and run an
    independent k-means with ``ksub`` codewords per subspace. Returns
    ``codebooks[sub][code] = list[int]`` — integer codewords over the
    ``round(x*quantize_scale)`` grid (:func:`quantize_vec`), so every
    distance/assignment in training AND search is an exact integer and the
    whole derivation is bit-identical in any engine (the same portability
    trick as ``ivf_train(quantize_scale=...)``).

    Determinism: init = the ``ksub`` smallest-id vectors' subvectors; each
    Lloyd round assigns by exact integer squared-L2 (ties → lower code)
    and updates codewords to the TRUNCATED integer mean ``sum div count``
    (Spark ``div``, DuckDB ``//``, both truncate toward zero — floor-style
    division would disagree between them on negative sums); an empty code
    keeps its previous codeword.

    Plan at scale: codebooks are dimension-sized (m·ksub·dsub ints) — they
    live on the driver and broadcast into expressions; each Lloyd round is
    ONE narrow job (per-sub assignment inline, partial-aggregated
    groupBy(sub, code, d)); the corpus is never collected. At 100 TB train
    on a sampled slice (codebooks converge on ~1e5 vectors), then
    :func:`pq_encode` the full corpus in one scan-local pass.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    seed_rows = (
        df.orderBy(id_col).limit(ksub).select(quantize_vec(vec_col, quantize_scale)).collect()
    )
    ksub = min(ksub, len(seed_rows))
    if ksub == 0:
        raise ValueError("pq_train: empty corpus")
    codebooks: list[list[list[int]]] = [
        [[int(x) for x in r[0][s * dsub:(s + 1) * dsub]] for r in seed_rows]
        for s in range(m)
    ]
    qv = quantize_vec(vec_col, quantize_scale)
    for _ in range(iters):
        subs = []
        for s in range(m):
            sv = F.slice(qv, s * dsub + 1, dsub)
            subs.append(
                F.struct(
                    F.lit(s).alias("sub"),
                    _pq_best_code(sv, codebooks[s]).alias("code"),
                    sv.alias("sv"),
                )
            )
        assigned = df.select(F.explode(F.array(*subs)).alias("a")).select(
            "a.sub", "a.code", "a.sv"
        )
        sums = (
            assigned.select("sub", "code", F.posexplode("sv").alias("d", "x"))
            .groupBy("sub", "code", "d")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
        for r in sums:
            acc.setdefault((r["sub"], r["code"]), {})[r["d"]] = (int(r["s"]), int(r["n"]))
        for s in range(m):
            for c in range(ksub):
                cell = acc.get((s, c))
                if cell is None:
                    continue  # empty code keeps its previous codeword
                codebooks[s][c] = [
                    # exact truncation toward zero (Python // floors)
                    (abs(sv_) // n_) * (1 if sv_ >= 0 else -1)
                    for d in range(dsub)
                    for sv_, n_ in (cell[d],)
                ]
    return codebooks


def _pq_codes_expr(codebooks, vec_col, quantize_scale: int):
    """array<int> of per-subspace argmin codes — the one encoding
    expression shared by pq_encode, pq_adc_topk, and ivfpq_topk."""
    from .textstats import _let

    m, dsub = len(codebooks), len(codebooks[0][0])
    # the quantized vector AND each subvector slice are let-bound (round-6):
    # the flat form re-ran the quantization transform m*ksub times (once per
    # codeword distance) because _pq_best_code references its subvector once
    # per codeword
    def _sub_code(qv, s: int):
        # closure over s, NOT a lambda default arg: pyspark binds extra
        # lambda params to the array-index variable (repo gotcha, see
        # minhash_signature)
        return _let(
            F.slice(qv, s * dsub + 1, dsub), lambda sv: _pq_best_code(sv, codebooks[s])
        )

    return _let(
        quantize_vec(vec_col, quantize_scale),
        lambda qv: F.array(*[_sub_code(qv, s) for s in range(m)]),
    )


def _pq_qsubs_expr(codebooks, vec_col, quantize_scale: int):
    """array<array<long>> of the query's quantized subvectors."""
    from .textstats import _let

    m, dsub = len(codebooks), len(codebooks[0][0])
    return _let(
        quantize_vec(vec_col, quantize_scale),
        lambda qv: F.array(*[F.slice(qv, s * dsub + 1, dsub) for s in range(m)]),
    )


def _pq_codebook_lit(codebooks):
    """The codebooks as one nested literal array (broadcast with the plan)."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(int(x)).cast("long") for x in code])
                    for code in codes
                ]
            )
            for codes in codebooks
        ]
    )


def _pq_adc_dist(codebooks, codes_col="codes", qsubs_col="_qsubs"):
    """The exact-integer ADC distance: Σ_s L2²(qsub[s], cb[s][codes[s]]) —
    a native codeword gather + fold, shared by pq_adc_topk and ivfpq_topk
    so the two scans can never drift."""
    cb = _pq_codebook_lit(codebooks)
    dist = None
    for s in range(len(codebooks)):
        codeword = F.element_at(
            F.element_at(cb, s + 1), F.element_at(codes_col, s + 1) + 1
        )
        term = F.aggregate(
            F.zip_with(
                F.element_at(qsubs_col, s + 1), codeword, lambda x, w: (x - w) * (x - w)
            ),
            F.lit(0).cast("long"),
            lambda acc, z: acc + z,
        )
        dist = term if dist is None else dist + term
    return dist


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: int = 1000,
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int> of length m) —
    each vector compresses to m smallint indexes (64-dim float → 4 bytes at
    m=4, the whole point of PQ at 100 TB: the code table fits in a
    fraction of the embedding footprint and the ADC scan reads only it).
    One scan-local pass, codebooks broadcast as literals, zero shuffles."""
    return df.select(
        F.col(id_col),
        _pq_codes_expr(codebooks, vec_col, quantize_scale).alias("codes"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantize_scale: int = 1000,
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance computation (ADC): the corpus is
    scanned as CODES ONLY (``pq_encode``), each (query, row) distance is the
    sum over subspaces of the exact integer squared-L2 between the query's
    quantized subvector and the row's codeword — the lookup-table scan of
    Jégou et al. 2011 §IV, expressed as a native codeword gather
    (``element_at`` into the broadcast codebook literal, no Python). The
    distance is an exact integer, so ranking (dist asc, id asc) is
    bit-identical in any engine with no rounding shim. Returns
    (query_id, vec_id, adc_dist, rank).

    Plan at scale: queries broadcast; the corpus side reads m smallints
    per row instead of the full vector — the scan is bandwidth-bound on a
    ~100× smaller table. Compose with the IVF coarse quantizer (assign
    corpus to :func:`ivf_train` lists, probe-filter before the ADC scan)
    for the standard IVFPQ layout when even the code scan is too much.
    """
    from pyspark.sql import Window as W

    c = pq_encode(corpus, codebooks, id_col, vec_col, quantize_scale)
    q = queries.select(
        F.col(query_id_col),
        _pq_qsubs_expr(codebooks, vec_col, quantize_scale).alias("_qsubs"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, _pq_adc_dist(codebooks).alias("adc_dist")
    )
    w = W.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ivf_centroids: list[list[int]],
    codebooks: list[list[list[int]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantize_scale: int = 1000,
) -> DataFrame:
    """IVFPQ (Jégou et al. 2011 §V, the layout FAISS popularized): the IVF
    coarse quantizer prunes WHICH rows are scored (each query probes its
    ``nprobe`` nearest inverted lists) and PQ codes compress WHAT is read
    per row (m smallints instead of the full vector) — the composition of
    :func:`ivf_train`/inverted-list probing with :func:`pq_adc_topk`'s
    ADC distance. Expects integer-parameterized inputs (``ivf_train(...,
    quantize_scale=...)`` centroids and :func:`pq_train` codebooks with
    the same scale), so every assignment, probe order, and distance is an
    exact-integer/portable derivation like its two parents. Returns
    (query_id, vec_id, adc_dist, rank) over the probed lists only.

    Plan at scale: one scan-local corpus pass computes (cluster, codes) —
    at rest this IS the index layout: partition by cluster, store codes —
    the probe is a broadcast join on cluster id touching ~nprobe/nlist of
    the code table, and the ADC math never reads the original vectors.
    """
    from pyspark.sql import Window as W

    cscores = _centroid_scores_int(vec_col, ivf_centroids, quantize_scale)
    c = corpus.select(
        F.col(id_col),
        F.array_min(cscores)["j"].alias("_cl"),
        _pq_codes_expr(codebooks, vec_col, quantize_scale).alias("codes"),
    )
    probes = F.transform(F.slice(F.array_sort(cscores), 1, nprobe), lambda s: s["j"])
    q = queries.select(
        F.col(query_id_col),
        _pq_qsubs_expr(codebooks, vec_col, quantize_scale).alias("_qsubs"),
        F.explode(probes).alias("_cl"),
    )
    scored = c.join(F.broadcast(q), "_cl").select(
        query_id_col, id_col, _pq_adc_dist(codebooks).alias("adc_dist")
    )
    w = W.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
    nlist: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    quantize_scale: int | None = None,
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """Semantic (embedding-space) duplicate pairs via clustering — the
    SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): partition the corpus
    with the IVF coarse quantizer (spherical k-means, :func:`ivf_train`),
    then compute exact cosine only WITHIN each cluster and keep pairs at or
    above ``threshold``. Complements the LSH route
    (:func:`embedding_neardup_pairs`): k-means buckets adapt to the data
    distribution where fixed hyperplanes cannot, at the cost of the
    training pass.

    Scale shape: centroids are dimension-sized (driver + broadcast into
    the assignment expression, corpus never collected); assignment is one
    narrow pass; the only shuffle keys on cluster id; ``max_cluster`` caps
    degenerate clusters before the self-join exactly like the LSH bucket
    cap (drop + ``oversized_buckets`` to log). Pass ``quantize_scale`` for
    the engine-portable integer parameterization (bit-identical
    assignments in any engine — the driver's oracle gate runs this path).

    Returns (a, b, cluster, cosine_sim) with a < b.
    """
    if centroids is None:
        centroids = ivf_train(
            df, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col,
            quantize_scale=quantize_scale,
        )
    scores = (
        _centroid_scores_int(vec_col, centroids, quantize_scale)
        if quantize_scale is not None
        else _centroid_scores(vec_col, centroids)
    )
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.array_min(scores)["j"].alias("b"),
        _norm(F.col(vec_col)).alias("n"),
    )
    if max_cluster is not None:
        sig = cap_buckets(sig, ["b"], max_cluster)
    return (
        sig.alias("l")
        .join(sig.alias("r"), (F.col("l.b") == F.col("r.b")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.b").alias("cluster"),
            (
                _dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
