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
    bpe_tokens: bool = False,
    html: bool = False,
    c4_rules: bool = False,
) -> DataFrame:
    """Curate a document corpus for training-data use. Returns one row per
    SURVIVING document: (doc_id, lang_guess, quality, ws_tokens,
    clean_text) — plus ``bpe_tokens`` (real-BPE count of the REDACTED
    text, functions.bpe's Arrow-batched encoder over the shipped default
    merges table) when ``bpe_tokens=True``; opt-in because it adds the
    chain's only Python stage (the driver gate keeps the default all-native
    column set, the BPE column is pytest-gated against the pure-Python
    reference).

    * ``dedup``: keep only the min-id document per normalized content hash
      (exact_duplicates' canonical rule). Computed SKEW-SAFE: a window
      partitioned by content hash would serialize a viral duplicate (one
      text repeated billions of times) into a single task, and AQE cannot
      split windows — so the min-id per hash is a partial-aggregated
      groupBy (map-side combine collapses duplicates before the shuffle)
      followed by a semi-join on the COMPOSITE key (hash, doc_id): every
      join key matches at most one row, so even a hash repeated 10⁹ times
      produces no hot join partition.
    * ``langs``: keep documents whose ``lang_id`` guess is in the set
      (``None`` keeps all languages).
    * ``min_quality``: threshold on ``quality_score`` rounded to 6 decimals
      (rounded BEFORE filtering so the cut is engine-portable).
    * ``clean_text``: ``redact_pii`` output (email/IP/Luhn-card/phone).
    * ``html=True`` prepends :func:`~anything2rdf_spark.operators.textstats.
      html_to_text` extraction; ``c4_rules=True`` then applies C4's line
      rules — the text becomes the surviving lines and pages failing
      :func:`c4_keep_page` drop. Both run BEFORE dedup (C4's own order:
      clean, then dedup the cleaned text) and both are scan-local, so the
      chain stays one pass + one shuffle with either flag on.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    d = apply_html_c4(d, html=html, c4_rules=c4_rules)
    if dedup:
        d = d.withColumn("_h", F.sha2(normalized_text("text"), 256))
        canon = d.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
        d = d.join(canon, ["_h", "doc_id"], "left_semi").drop("_h")
    d = d.withColumn("lang_guess", lang_id("text"))
    if langs is not None:
        d = d.filter(F.col("lang_guess").isin(list(langs)))
    d = d.withColumn("quality", F.round(quality_score("text"), 6))
    if min_quality > 0.0:
        d = d.filter(F.col("quality") >= min_quality)
    out = d.select(
        "doc_id",
        "lang_guess",
        "quality",
        ws_token_count("text").alias("ws_tokens"),
        redact_pii("text").alias("clean_text"),
    )
    if bpe_tokens:
        from ..functions.bpe import bpe_token_count

        out = out.withColumn("bpe_tokens", bpe_token_count(F.col("clean_text")))
    return out


def pack_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    token-budget pack, keyed (bucket, pack_id). Returns one row per doc:
    (doc_id, n_tokens, bucket, pack_id).

    Packing is BUCKETED: documents hash into buckets via the non-negative
    modulo ``pmod(doc_id, n_buckets)`` (mirror with ``((id % n) + n) % n``
    in engines whose ``%`` follows the dividend's sign) and are packed in
    deterministic doc_id order within each —
    a single global packing order would serialize the cumsum window into
    one task at 100 TB, while per-bucket windows scale with parallelism
    (raise ``n_buckets`` with the cluster).

    Boundary rule: pack_id = floor(exclusive-prefix-sum(n_tokens) /
    max_tokens), i.e. a document belongs to the pack its tokens START in.
    That makes the assignment a pure window expression (no sequential
    state, engine-portable); the cost is a bounded overfill — a pack's
    token sum is < max_tokens + its largest document, the standard
    quasi-packing bound. Exact next-fit would need a sequential scan per
    bucket (applyInPandas); use it only if strict caps matter more than
    staying native.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
    ).withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int"))
    # n_tokens as the tie-breaker makes the output MULTISET deterministic
    # even with duplicate doc_ids: rows tying on (doc_id, n_tokens) are
    # interchangeable (swapping them permutes the same prefix values), and
    # later rows' prefixes are unaffected either way
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id", "n_tokens")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.floor(prefix / max_tokens).cast("int").alias("pack_id"),
    )


def pack_token_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    n_buckets: int = 64,
    eos: str = "</s>",
    tokenizer: str = "ws",
) -> DataFrame:
    """The GPT-style training-sequence assembly step: concatenate each
    bucket's documents (doc_id order, one ``eos`` token appended per doc)
    into a token stream and chunk it into fixed ``seq_len`` windows —
    what ``pack_documents`` assigns, this materializes. Returns one row
    per sequence: (bucket, seq_idx, n_toks, n_docs, toks_md5) where
    ``toks_md5`` fingerprints the space-joined token window (tokens are
    whitespace tokens, so the join is lossless) and the final sequence of
    a bucket may have ``n_toks < seq_len`` (trailing partial — filter on
    ``n_toks = seq_len`` for strict training batches).

    ``tokenizer='ws'`` (default) keeps the whole derivation native and
    SQL-mirrorable; ``tokenizer='bpe'`` swaps in the real-BPE subword
    symbols (functions.bpe, Arrow-batched pandas UDF) — same downstream
    plan, pytest-gated instead of oracle-gated.

    Plan at scale, mirroring pack_documents' bucketing argument: the
    offset prefix-sum is a per-bucket window (scales with ``n_buckets``,
    raise it with the cluster); the chunking is posexplode → one
    partial-aggregated groupBy (bucket, seq_idx) — uniform keys sized by
    ``seq_len``, AQE-splittable, no global order anywhere. Duplicate
    doc_ids tie-break by token count exactly like pack_documents; note the
    determinism caveat (r5 ADVICE): two rows sharing BOTH doc_id and token
    count but with different text get arbitrary relative offsets, so
    ``toks_md5`` is only deterministic when doc_id is unique (or duplicate
    ids never tie on token count with distinct text) — the id-uniqueness
    contract every caller in this repo satisfies. The in-sequence sort key
    is (gpos, tok), unique for distinct ids.
    """
    if tokenizer == "ws":
        from .textstats import _ws_tokens

        toks = _ws_tokens(F.col(text_col))
    elif tokenizer == "bpe":
        from ..functions.bpe import bpe_symbols

        toks = bpe_symbols(F.col(text_col))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(toks, F.array(F.lit(eos))).alias("toks"),
    ).withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int"))
    d = d.withColumn("n", F.size("toks"))
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id", "n")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d = d.withColumn("off", F.coalesce(F.sum("n").over(w), F.lit(0)))
    tok = d.select(
        "bucket", "doc_id", "off", F.posexplode("toks").alias("pos", "tok")
    ).select(
        "bucket",
        "doc_id",
        "tok",
        (F.col("off") + F.col("pos")).alias("gpos"),
    )
    tok = tok.withColumn(
        "seq_idx", F.floor(F.col("gpos") / F.lit(seq_len)).cast("int")
    )
    return (
        tok.groupBy("bucket", "seq_idx")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("gpos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("toks_md5"),
        )
        .select("bucket", "seq_idx", "n_toks", "n_docs", "toks_md5")
    )


def cap_per_group(
    docs: DataFrame,
    by: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
    seed: int = 11,
    salt_buckets: int = 16,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-group document caps (the RefinedWeb/C4 per-domain limit):
    deterministically keep at most ``cap`` documents per ``by`` group —
    the ones with the smallest seeded hash, so the selection is a stable
    uniform sample independent of partition layout. Returns the kept
    rows: (group, doc_id).

    Skew-safe top-k: a single ``row_number`` window over the group key
    serializes a viral group (one domain with 10⁹ docs) into one task,
    and AQE cannot split windows — so selection runs in two phases:
    a per-(group, salt) window keeps each salt bucket's top ``cap``
    (bounding any task at the bucket's share), then a per-group window
    over the ≤ ``salt_buckets * cap`` survivors picks the final top
    ``cap``. Both phases order by the same total order (hash, id), so
    the result is EXACTLY the global per-group top-cap — the two-phase
    split changes the plan, never the answer. Raise ``salt_buckets``
    with the cluster.
    """
    from pyspark.sql import Window

    from .dedupe import hash64

    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    d = docs.select(
        F.col(by).alias("grp"),
        F.col(id_col).alias("doc_id"),
        hash64(key, seed, hash_mode).alias("h"),
    )
    w1 = Window.partitionBy(
        "grp", F.pmod(F.col("h"), F.lit(salt_buckets))
    ).orderBy("h", "doc_id")
    d = d.withColumn("rn1", F.row_number().over(w1)).filter(F.col("rn1") <= cap)
    w2 = Window.partitionBy("grp").orderBy("h", "doc_id")
    return (
        d.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= cap)
        .select(F.col("grp").alias(by), "doc_id")
    )


def dsir_log_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_mod: int = 13,
    target_col: str | None = None,
    n_features: int = 2048,
    seed: int = 7,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by the log likelihood ratio of a TARGET hashed-ngram multinomial to
    the RAW one, so downstream selection can resample the raw corpus
    toward the target distribution. Features are lowercased word unigrams
    + bigrams hashed into ``n_features`` buckets; the target split is
    in-corpus (``doc_id % target_mod == 0``) unless ``target_col`` names a
    boolean column. Both multinomials use add-one smoothing. Returns one
    row per document with ≥ 1 token: (doc_id, n_feat, logw_micro).

    Cross-engine determinism: the per-bucket log ratio is floored to
    INTEGER micronats once (``lam``), so every per-document score is a sum
    of integers — exact, order-independent, immune to float-summation
    reorder across partitions and to last-ulp ``ln`` differences between
    libm implementations (only a bucket whose true ratio sits within
    ~1e-10 of a micronat grid line could ever differ, and then by 1).

    Plan at scale: the distribution table partial-aggregates to ≤
    ``n_features`` rows (map-side combine collapses the token stream
    before its shuffle), totals are one broadcast row, and scoring is a
    broadcast join back onto the exploded features + one partial-
    aggregated groupBy(doc_id) — no window, no Python. The exploded
    features are computed twice (distribution pass, scoring pass);
    at 100 TB recomputing a scan-local explode beats persisting it.
    """
    from .dedupe import hash64
    from .textstats import _ws_tokens, word_ngram_array

    toks = _ws_tokens(F.lower(F.col(text_col)))
    feats = F.concat(toks, word_ngram_array(toks, 2))
    is_t = (
        F.col(target_col).cast("boolean")
        if target_col is not None
        else F.pmod(F.col(id_col), F.lit(target_mod)) == 0
    )
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            is_t.alias("is_t"),
            F.explode(feats).alias("ng"),
        )
        .select(
            "doc_id",
            "is_t",
            F.pmod(hash64(F.col("ng"), seed, hash_mode), F.lit(n_features)).alias("b"),
        )
    )
    dist = d.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("c_t"),
    )
    tot = dist.agg(F.sum("c_r").alias("tot_r"), F.sum("c_t").alias("tot_t"))
    lam = dist.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            F.lit(1_000_000.0)
            * (
                F.log(F.col("c_t") + 1)
                - F.log(F.col("tot_t") + n_features)
                - F.log(F.col("c_r") + 1)
                + F.log(F.col("tot_r") + n_features)
            )
        )
        .cast("long")
        .alias("lam"),
    )
    return (
        d.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum("lam").alias("logw_micro"),
        )
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic dataset splitting (train/val/test) by seeded id hash.

    Each row's split label is a pure function of (id, seed): stable across
    runs, partitionings, and cluster sizes — unlike ``randomSplit``, whose
    assignment depends on partition layout. The hash maps to a uniform
    value in [0, 1e6) and the label is picked by cumulative weight
    boundaries in the dict's insertion order. ``hash_mode='md5_60'`` is the
    engine-portable variant (see dedupe.hash64) used by the oracle gate;
    production stays on xxhash64.

    NULL ids hash a fixed sentinel string (identically in both hash modes),
    so all null-id rows land deterministically in ONE split — filter or
    repair them upstream if proportional treatment matters.

    Scan-local: one hash + one CASE per row, zero shuffles.
    """
    from .dedupe import hash64

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative split weight in {weights}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError(f"split weights must sum to > 0, got {weights}")
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    u = F.pmod(hash64(key, seed, hash_mode), F.lit(1_000_000))
    items = list(weights.items())
    chain = None
    cum = 0.0
    for name, wgt in items[:-1]:
        cum += wgt / total
        cond = u < int(round(cum * 1_000_000))
        chain = F.when(cond, name) if chain is None else chain.when(cond, name)
    label = chain.otherwise(items[-1][0]) if chain is not None else F.lit(items[-1][0])
    return docs.withColumn("split", label)


def dsir_resample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_seed: int = 101,
    hash_mode: str = "xxhash64",
    threshold_prefilter: bool | None = None,
    prefilter_slack: float = 1.0,
    **dsir_kwargs,
) -> DataFrame:
    """The DSIR selection ACTION (Xie et al. 2023 §2.2): Gumbel top-k
    importance resampling — draw k documents WITHOUT replacement with
    probability proportional to softmax(log w) by perturbing each score
    with an independent Gumbel noise term and taking the global top-k
    (Vieira 2014's Gumbel-max trick, the estimator the DSIR paper uses).
    Completes detect→act for ``dsir_log_weights`` the way
    ``fuzzy_dedup_verdicts`` completes MinHash.

    The "noise" is DETERMINISTIC: u = hash-uniform(id, sample_seed) in
    (0, 1), g = -ln(-ln(u)), key_micro = logw_micro + floor(1e6·g) — the
    same draw for the same (id, seed) on any cluster size or partition
    layout, so the selection is reproducible end-to-end. Ties on key_micro
    break by ascending id. Returns the selected rows:
    ``(doc_id, n_feat, logw_micro, key_micro)``.

    Plan at scale: scoring is ``dsir_log_weights``'s plan; the top-k is
    ``ORDER BY … LIMIT k``. For small k Spark executes that as
    TakeOrderedAndProject — per-partition top-k then a k·partitions driver
    merge, no global sort shuffle — but beyond
    ``spark.sql.execution.topKSortFallbackThreshold`` it silently becomes a
    GLOBAL SORT of the whole corpus plus a driver-sided limit. The
    ``threshold_prefilter`` path (round-6; VERDICT r5 item 3) closes that:

    1. one ``approxQuantile`` (Greenwald-Khanna sketch, deterministic rank
       error ≤ relativeError·n) picks a key cutoff at probability
       ``1 - (k/n)·(1 + prefilter_slack)`` with
       ``relativeError = (k/n)·prefilter_slack/2`` — the error bound
       guarantees the cutoff's rank is ≤ n - k, i.e. the TRUE top-k all
       survive the filter;
    2. the corpus is filtered to ~k·(1+prefilter_slack) survivors;
    3. the exact ORDER BY … LIMIT k runs on the survivors only.

    The selected SET is provably identical to the direct path (test-pinned);
    only rows that could never be in the top-k are skipped. Cost: one extra
    count + one quantile-sketch pass (both driver-scalar results).
    ``threshold_prefilter=None`` auto-enables above k > 10⁷; the default
    path (and therefore every oracle-gated query) is byte-identical to
    round 5. Degenerate cases (k ≥ n·(1+slack)⁻¹ quantile probability ≤ 0)
    fall back to the direct path.
    """
    from .dedupe import hash64

    w = dsir_log_weights(
        docs, id_col=id_col, text_col=text_col, hash_mode=hash_mode, **dsir_kwargs
    )
    h = hash64(F.col("doc_id").cast("string"), sample_seed, hash_mode)
    if hash_mode == "md5_60":
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    else:
        u = h.cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    u = F.greatest(u, F.lit(2.0**-60))  # xxhash64 can land exactly on 0
    key = F.col("logw_micro") + F.floor(F.lit(1_000_000.0) * -F.log(-F.log(u))).cast("long")
    keyed = w.withColumn("key_micro", key)
    if threshold_prefilter is None:
        threshold_prefilter = k > 10_000_000
    if threshold_prefilter:
        n = keyed.count()
        frac = k / max(n, 1)
        prob = 1.0 - frac * (1.0 + prefilter_slack)
        if n > k and prob > 0.0:
            rel_err = max(frac * prefilter_slack / 2.0, 1e-6)
            (cutoff,) = keyed.stat.approxQuantile(
                "key_micro", [prob], rel_err
            )
            keyed = keyed.filter(F.col("key_micro") >= F.lit(int(cutoff)))
    return keyed.orderBy(F.desc("key_micro"), F.asc("doc_id")).limit(k)


def mixture_weights(
    docs: DataFrame,
    by: str = "source",
    alpha: float = 0.5,
    budget_tokens: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based domain mixture reweighting — the α-sampling rule
    of Lample & Conneau 2019 (XLM §3.1, the multilingual up/down-sampling
    exponent XLM-R and mT5 tuned; the per-source mixture tables Gopher and
    LLaMA publish): each group's sampling weight ∝ n_tokens^α, with α < 1
    flattening the natural distribution toward low-resource groups.

    α is restricted to {1.0, 0.5, 0.25}: 0.5 and 0.25 compute as a sqrt
    chain (IEEE-754 sqrt is CORRECTLY ROUNDED, so the chain is
    bit-identical in any compliant engine) and 1.0 is the identity — an
    arbitrary α needs pow(), whose last-ulp behavior is libm-specific;
    add one only via the integer micronat-grid pattern dsir_log_weights
    uses.

    Returns one dimension-sized row per group:
    ``(by, n_docs, n_tokens, w_micro, share_ppm[, quota_tokens])`` —

    * ``w_micro``   = floor(1e6 · n_tokens^α)  (α=1: n_tokens itself);
    * ``share_ppm`` = (1e6 · w_micro) div Σ w_micro — the group's mixture
      probability in ppm, exact integer division;
    * ``quota_tokens`` = (share_ppm · budget_tokens) div 1e6 — the group's
      token budget at ppm granularity (when ``budget_tokens`` is given).

    The two divisions run in DECIMAL(38,0) (DuckDB mirror: HUGEINT), so
    neither the 1e6-scaled numerator (α=1 with a 1e13-token group would
    overflow a BIGINT) nor share·budget can wrap — Spark's ANSI mode
    would otherwise kill the job with ARITHMETIC_OVERFLOW exactly at the
    corpus sizes this operator targets.

    Plan at scale: one partial-aggregated groupBy over the corpus (the
    only shuffle — map-side combine reduces each task to ≤ |groups| rows),
    then a single-row total broadcast onto the dimension-sized result.
    """
    from .textstats import ws_token_count

    if alpha not in (1.0, 0.5, 0.25):
        raise ValueError(f"alpha must be one of 1.0/0.5/0.25, got {alpha}")
    g = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count(F.col(text_col)).cast("long")).alias("n_tokens"),
    )
    x = F.col("n_tokens").cast("double")
    if alpha == 1.0:
        w = F.col("n_tokens")
    elif alpha == 0.5:
        w = F.floor(F.lit(1_000_000.0) * F.sqrt(x)).cast("long")
    else:
        w = F.floor(F.lit(1_000_000.0) * F.sqrt(F.sqrt(x))).cast("long")
    g = g.withColumn("w_micro", w)
    tot = g.agg(F.sum("w_micro").alias("tot_w"))
    out = g.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(by),
        "n_docs",
        "n_tokens",
        "w_micro",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * w_micro) div tot_w AS BIGINT)"
        ).alias("share_ppm"),
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "quota_tokens",
            F.expr(
                f"CAST((CAST(share_ppm AS DECIMAL(38,0)) * {int(budget_tokens)})"
                " div 1000000 AS BIGINT)"
            ),
        )
    return out


def mixture_select(
    docs: DataFrame,
    by: str = "source",
    alpha: float = 0.5,
    budget_tokens: int = 1_000_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 17,
    salt_buckets: int = 16,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Apply :func:`mixture_weights`' quotas — the mixture ACTION: select a
    deterministic uniform subset of each group's documents until the
    group's token quota fills, producing a corpus whose per-group token
    shares follow the α-tempered mixture. Selection order is the seeded
    id hash (a stable uniform sample independent of partition layout, the
    ``cap_per_group`` convention); a document is kept iff its tokens START
    inside the quota (exclusive-prefix-sum rule), so overfill is bounded
    by one document per salt bucket — ``pack_documents``' quasi-packing
    bound. Returns the selected rows: (by, doc_id, n_tokens).

    Skew-safety: a single per-group prefix-sum window would serialize a
    viral group into one task, so each group's quota is split across
    ``salt_buckets`` hash-salt buckets (integer split, remainder spread
    over the first ``quota % salt_buckets`` buckets) and each
    (group, salt) bucket fills its own share with its own bounded window
    — raise ``salt_buckets`` with the cluster. The split changes WHICH
    documents fill the quota (bucket shares fill independently) but not
    the quota accounting itself; per-bucket selection remains exactly
    uniform-by-hash.

    Plan at scale: mixture_weights' one aggregate, a broadcast of the
    dimension-sized quota table, and the salted windows — the corpus text
    never shuffles (token counts ride the scan); only (group, salt, hash,
    id, n_tokens) rows move.
    """
    from .dedupe import hash64
    from .textstats import ws_token_count

    w = mixture_weights(
        docs, by=by, alpha=alpha, budget_tokens=budget_tokens, text_col=text_col
    )
    q = w.select(F.col(by).alias("grp"), "quota_tokens")
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    d = docs.select(
        F.col(by).alias("grp"),
        F.col(id_col).alias("doc_id"),
        ws_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        hash64(key, seed, hash_mode).alias("h"),
    ).withColumn("salt", F.pmod(F.col("h"), F.lit(salt_buckets)).cast("int"))
    d = d.join(F.broadcast(q), "grp")
    quota_s = F.expr(f"quota_tokens div {salt_buckets}") + F.when(
        F.col("salt") < F.expr(f"quota_tokens % {salt_buckets}"), F.lit(1)
    ).otherwise(F.lit(0))
    win = (
        W.partitionBy("grp", "salt")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(win), F.lit(0).cast("long"))
    return (
        d.withColumn("_q", quota_s.cast("long"))
        .withColumn("_p", prefix)
        .filter(F.col("_p") < F.col("_q"))
        .select(F.col("grp").alias(by), "doc_id", "n_tokens")
    )


# Terminal punctuation a surviving C4 line must end with (Raffel et al.
# 2020 §2.2: "period, exclamation mark, question mark, or end quotation
# mark" — straight AND curly quote variants).
C4_LINE_TERMINAL_RE = "[.!?\"'”’]$"


def c4_kept_lines(text, min_words: int = 5):
    """The surviving lines of a page under C4's line rules, as an
    array<string> column — the shared expression behind
    :func:`c4_line_filter` and ``curate_corpus(c4_rules=True)``.

    Lines split on ``\\r?\\n`` (not bare ``\\n``): CRLF text would
    otherwise leave a trailing ``\\r`` on every line, and Java's
    unanchored ``$`` matches BEFORE a final line terminator while RE2's
    does not — the terminal-punctuation test would diverge between Spark
    and the oracle engine on every CRLF document."""

    def _ok(line):
        t = F.trim(line)
        words = F.filter(F.split(t, r"\s+"), lambda x: x != "")
        return (
            t.rlike(C4_LINE_TERMINAL_RE)
            & (F.size(words) >= min_words)
            & (F.instr(F.lower(line), "javascript") == 0)
        )

    return F.filter(F.split(text, r"\r?\n"), _ok)


def c4_keep_page(text, kept, min_kept_lines: int = 3):
    """C4's page-level verdict over the original text and its surviving
    lines (no "lorem ipsum", no '{', ≥ min_kept_lines survivors)."""
    return (
        (F.instr(F.lower(text), "lorem ipsum") == 0)
        & (F.instr(text, "{") == 0)
        & (F.size(kept) >= min_kept_lines)
    )


def apply_html_c4(
    df: DataFrame, html: bool = False, c4_rules: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """The shared cleaning preamble of ``curate_corpus`` and
    ``streaming_curate``: optional HTML→text extraction, then optional C4
    line rules (text becomes the surviving lines, pages failing
    :func:`c4_keep_page` drop). ONE implementation for batch and
    streaming — the ops are pure narrow expressions, so they compose with
    readStream unchanged; keeping a single copy is what makes the
    stream ≡ batch equivalence test a guarantee instead of a hope."""
    if html:
        from .textstats import html_to_text

        df = df.withColumn(text_col, html_to_text(F.col(text_col)))
    if c4_rules:
        kept = c4_kept_lines(F.col(text_col))
        df = (
            df.withColumn("_kp", c4_keep_page(F.col(text_col), kept))
            .withColumn(text_col, F.array_join(kept, "\n"))
            .filter(F.col("_kp"))
            .drop("_kp")
        )
    return df


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2, the heuristic
    family behind the C4 corpus), as a per-document verdict + splice:

    * keep a line only if it ends in a terminal punctuation mark
      (``C4_LINE_TERMINAL_RE``), has ≥ ``min_words`` whitespace words, and
      does not mention "javascript" (case-insensitive);
    * drop the whole page if it contains "lorem ipsum" (placeholder
      boilerplate), a ``{`` (leftover code/markup), or fewer than
      ``min_kept_lines`` surviving lines (the paper's "fewer than 3
      sentences" rule, with kept lines as the sentence unit).

    Returns one row per document: (doc_id, n_lines, n_kept, keep_page,
    clean_md5, clean_len) where ``clean_md5``/``clean_len`` fingerprint the
    newline-joined surviving lines — the splice result — without carrying
    the full cleaned text through the gate (join back on doc_id and re-run
    the same filter expression to materialize it).

    Plan at scale: the whole operator is ONE scan-local projection — split,
    higher-order ``filter`` with a native lambda, ``array_join``, ``md5`` —
    zero shuffles, zero Python, survives any corpus size at scan speed.
    Word counting trims spaces then splits on ``\\s+`` (the engine-portable
    convention the DSIR featurizer uses).
    """
    kept = c4_kept_lines(F.col(text_col), min_words)
    lines = F.split(F.col(text_col), r"\r?\n")
    clean = F.array_join(kept, "\n")
    keep_page = c4_keep_page(F.col(text_col), kept, min_kept_lines)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        keep_page.alias("keep_page"),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).alias("clean_len"),
    )


def pareto_accept_verdicts(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_ppm_col: str = "score_ppm",
    alpha: int = 2,
    seed: int = 31,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The GPT-3 quality-sampling ACTION (Brown et al. 2020, Appendix A):
    instead of a hard quality threshold, keep a document stochastically —
    ``np.random.pareto(α) > 1 - document_score`` in the paper — so
    high-scoring documents are mostly kept but low-scoring ones still
    enter the corpus occasionally (the smooth cut that avoids cloning the
    classifier's bias into a hard boundary). Completes detect→act for the
    quality scorers (quality_score, seed_lm_familiarity, DSIR) the way
    ``dsir_resample`` completes DSIR.

    Deterministic and engine-portable: the Pareto draw is the inverse-CDF
    transform ``u^(-1/α) - 1`` of a hash-uniform u in (0, 1] per (id,
    seed) — the same draw on any cluster size or partition layout. α is
    restricted to {1, 2, 4}: u^(-1) is one IEEE division and u^(-1/2),
    u^(-1/4) are reciprocal sqrt chains — every step correctly rounded,
    so both engines compute the identical double before the single
    ``floor`` onto the integer micro grid (arbitrary α — the paper used
    9 — needs pow(); add it via the micronat-grid pattern
    ``dsir_log_weights`` documents). The keep rule is evaluated ON the
    grid: keep iff ``draw_micro > 1e6 - score_ppm``.

    ``scored`` carries (id_col, score_ppm_col) with the score already in
    integer ppm of [0, 1] (e.g. ``lm_quality_buckets``' coverage_ppm, or
    ``floor(quality * 1e6)``). Returns (id_col, score_ppm, draw_micro,
    keep). Scan-local: one hash + one sqrt chain per row, zero shuffles.
    """
    from .dedupe import hash64

    if alpha not in (1, 2, 4):
        raise ValueError(f"alpha must be one of 1/2/4, got {alpha}")
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    h = hash64(key, seed, hash_mode)
    if hash_mode == "md5_60":
        u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**60))
    else:
        u = (h.cast("double") / F.lit(float(2**64)) + F.lit(0.5)) + F.lit(2.0**-64)
    # u in (0, 1]: inverse CDF needs u > 0; u == 1 → draw 0 is fine
    inv = F.lit(1.0) / u
    if alpha == 2:
        inv = F.lit(1.0) / F.sqrt(u)
    elif alpha == 4:
        inv = F.lit(1.0) / F.sqrt(F.sqrt(u))
    draw_micro = F.floor(F.lit(1_000_000.0) * (inv - F.lit(1.0))).cast("long")
    s = F.col(score_ppm_col).cast("long")
    return scored.select(
        F.col(id_col),
        s.alias("score_ppm"),
        draw_micro.alias("draw_micro"),
        (draw_micro > (F.lit(1_000_000).cast("long") - s)).alias("keep"),
    )


def domain_block_verdicts(
    docs: DataFrame,
    blocked_domains,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """C4-style URL blocklist filtering (Raffel et al. 2020 drop any page
    matching a curated badlist; RefinedWeb's URL filtering matches whole
    registered domains): a per-document verdict ``(id_col, blocked)`` where
    ``blocked`` is true iff the text mentions at least one URL whose domain
    — or any parent domain with ≥ 2 labels — appears in the blocklist, so
    an entry ``bad.example`` also blocks ``cdn.bad.example``. Bare TLDs
    never match a multi-label domain's suffix set; a WHOLE single-label
    domain (``http://localhost/``) still matches a single-label blocklist
    entry exactly (the guard emits the 1-label suffix for 1-label domains
    — r5 ADVICE doc drift, behavior unchanged and oracle-mirrored). ``docs.join(v, id_col).filter("NOT blocked")`` is the
    filtered corpus. ``blocked_domains`` is a DataFrame with ``domain_col``
    (or a plain list of strings).

    Plan at scale: domains extract inside the document scan (one native
    regexp), each expands to its ≤ label-count parent suffixes (bounded
    fan-out), and membership is a broadcast semi-join against the
    blocklist — real-world blocklists (UT1, C4's badlist) are
    dimension-sized. One distinct on the blocked ids, one left join back;
    the corpus text is never shuffled.
    """
    from .textstats import extract_domains

    if not isinstance(blocked_domains, DataFrame):
        blocked_domains = docs.sparkSession.createDataFrame(
            [(d,) for d in blocked_domains], f"{domain_col} string"
        )
    bl = blocked_domains.select(F.lower(F.col(domain_col)).alias("_bd")).distinct()
    labels = F.split(F.col("_d"), r"\.")
    nl = F.size(labels)
    doms = docs.select(
        F.col(id_col).alias("_id"), F.explode(extract_domains(F.col(text_col))).alias("_d")
    )
    sufs = doms.select(
        "_id",
        F.explode(
            F.transform(
                # i = 1..nl-1 keeps every suffix with >= 2 labels (incl. the
                # whole domain); greatest() guards the descending-sequence
                # trap for a pathological single-label domain
                F.sequence(F.lit(1), F.greatest(nl - 1, F.lit(1))),
                lambda i: F.concat_ws(".", F.slice(labels, i, nl - i + 1)),
            )
        ).alias("_bd"),
    )
    hit = sufs.join(F.broadcast(bl), "_bd", "semi").select("_id").distinct()
    return (
        docs.select(F.col(id_col))
        .join(hit.withColumnRenamed("_id", id_col).withColumn("_hit", F.lit(True)), id_col, "left")
        .select(id_col, F.coalesce("_hit", F.lit(False)).alias("blocked"))
    )
