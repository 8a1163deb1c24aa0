"""Deduplication operators for large-scale training-data pipelines.

All-native column expressions (JVM-side, codegen'd); the only shuffles are
the final groupBy/join on the candidate keys. Designed so each family works
at 100 TB: exact dedup is a single hash-aggregate; MinHash-LSH turns the
O(n²) similarity problem into per-band bucket joins; SimHash reduces a
document to one 64-bit key.

* exact:   sha2 over normalized text → groupBy → canonical = min doc_id
* minhash: shingles → k independent xxhash64 mins → banded LSH bucket join
* simhash: per-bit weighted votes over token hashes → 64-bit signature
* n-gram Jaccard: shared-shingle self-join → |∩| / (|A|+|B|-|∩|)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def normalized_text(col="text"):
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def hash64(col, seed: int = 0, mode: str = "xxhash64"):
    """Seeded 64-bit hash of a string column under two interchangeable
    strategies:

    * ``xxhash64`` — the fast JVM path (default; what a production run uses).
    * ``md5_60``  — a 60-bit hash from the md5 hex prefix, reproducible in
      any engine with md5 (DuckDB: ``('0x' || substr(md5(seed||':'||s),1,15))
      ::BIGINT``) — used by the driver's oracle-checked queries so Spark and
      DuckDB compute identical signatures. Always non-negative (< 2^60).
    """
    c = F.col(col) if isinstance(col, str) else col
    if mode == "xxhash64":
        return F.xxhash64(c, F.lit(seed))
    if mode == "md5_60":
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hash mode {mode!r}")


def url_duplicates(df: DataFrame, id_col: str = "doc_id", url_col: str = "url") -> DataFrame:
    """URL-level dedup — the first dedup stage of every crawl-derived
    corpus (same page fetched under tracking params, scheme, www, or
    fragment variants): key on :func:`~anything2rdf_spark.operators.
    textstats.canonical_url` and keep the min-id row per canonical URL.
    Returns (doc_id, canonical_url, canonical_id, is_dup) — the
    ``exact_duplicates`` contract over the URL key.

    Same skew-safe plan as exact_duplicates: partial-aggregated min-id
    per key (map-side combine collapses a viral URL before the shuffle)
    + composite-key semi-join, never a window over the URL hash.

    NULL urls pass through as non-duplicates (canonical_id = own id) —
    they must not silently vanish from the survivor set, and an equi-join
    on a NULL key would drop them; the grouping key coalesces to a
    per-row sentinel so each null-url row is its own group."""
    from .textstats import canonical_url

    d = df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url"))
    key = F.coalesce(
        F.col("canonical_url"),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    d = d.withColumn("_k", key)
    canon = d.groupBy("_k").agg(F.min(id_col).alias("canonical_id"))
    return d.join(canon, "_k").select(
        id_col,
        "canonical_url",
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
    )


def novel_documents(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Incremental (cross-snapshot) dedup — the standing-corpus pattern of
    a continuously-crawled pipeline: a new batch dedups (a) against the
    PRIOR snapshot's content-hash table and (b) within itself, keeping the
    min-id representative of each novel content. ``seen_hashes`` carries
    ``hash_col`` = sha256 of :func:`normalized_text` — exactly the
    ``exact_duplicates`` key, so the snapshot table is just its
    ``content_hash`` column persisted across crawls. Returns the
    surviving rows: (doc_id, content_hash).

    Plan at scale: the hash rides the new-batch scan; (a) is an ANTI join
    on the hash (broadcast when the snapshot table is dim-sized, shuffle
    hash join — AQE-splittable — when it is crawl-scale); (b) is the
    skew-safe partial-aggregated min-per-hash + composite-key semi-join,
    never a window (a viral duplicate collapses map-side)."""
    d = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(normalized_text(text_col), 256).alias(hash_col),
    )
    # no .distinct() on the snapshot side: anti-join semantics ignore key
    # multiplicity, and a distinct would add a full extra shuffle over the
    # crawl-scale snapshot on every incremental batch
    d = d.join(seen_hashes.select(F.col(hash_col)), hash_col, "left_anti")
    canon = d.groupBy(hash_col).agg(F.min("doc_id").alias("doc_id"))
    return d.join(canon, [hash_col, "doc_id"], "left_semi").select("doc_id", hash_col)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: returns (doc_id, content_hash,
    canonical_id, is_dup).

    Computed as a partial-aggregated min-per-hash groupBy + equi-join on
    the hash rather than a window over content_hash: a window serializes a
    viral duplicate (one text repeated 10⁹ times) into a single task and
    AQE cannot split windows, while the groupBy collapses duplicates
    map-side before its shuffle and the join is AQE-skew-splittable (and
    broadcasts outright when the distinct-hash side is small)."""
    hashed = df.select(
        F.col(id_col), F.sha2(normalized_text(text_col), 256).alias("content_hash")
    )
    canon = hashed.groupBy("content_hash").agg(F.min(id_col).alias("canonical_id"))
    return hashed.join(canon, "content_hash").select(
        id_col,
        "content_hash",
        "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
    )


def shingles(col, n: int = 5):
    """Word n-gram shingle array (distinct) from text — native exprs.
    The normalized text and its token split are let-bound (round-6) so each
    is evaluated once, not once per reference."""
    from .textstats import _let

    c = F.col(col) if isinstance(col, str) else col

    def _from_norm(nt: Column) -> Column:
        def _from_toks(toks: Column) -> Column:
            k = F.size(toks) - (n - 1)
            return F.when(k <= 0, F.array(nt)).otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), k),
                        lambda i: F.array_join(F.slice(toks, i, n), " "),
                    )
                )
            )

        return _let(F.split(nt, " "), _from_toks)

    return _let(normalized_text(c), _from_norm)


def minhash_signature(shingle_col, num_hashes: int = 32, hash_mode: str = "xxhash64"):
    """MinHash signature: sig[i] = min over shingles of hash64(s, seed=i).
    Returns array<bigint> of length num_hashes; empty shingle set → nulls.

    The shingle array is let-bound (round-6): the previous form inlined the
    whole shingle construction (normalize + split + n-gram transform +
    distinct) once PER HASH — num_hashes full recomputations per row."""
    from .textstats import _let

    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col

    def _sig(arr: Column) -> Column:
        def one(seed: int):
            # closure, NOT a default lambda arg: pyspark binds extra lambda
            # params to the array-index variable, silently breaking the seed
            return F.array_min(F.transform(arr, lambda s: hash64(s, seed, hash_mode)))

        return F.array(*[one(i) for i in range(num_hashes)])

    return _let(sh, _sig)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
    max_bucket: int | None = 100_000,
    log_dropped: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (a < b), deduplicated across
    bands. rows_per_band = num_hashes // bands; two docs are candidates when
    any band's signature slice matches exactly — the classic banding scheme
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3). The band
    bucket key is the slice itself (joined as a string), not a re-hash —
    no false candidates from bucket collisions, and engine-portable.

    ``max_bucket`` guards the within-bucket self-join against a degenerate
    hot bucket (a corpus of near-identical docs lands in one bucket and the
    join goes quadratic): rows in (band, bucket) groups above the cap are
    excluded from pairing (``None`` disables; the cap drops those buckets'
    candidate pairs — an all-identical corpus above the cap should be
    routed through ``exact_duplicates`` first, which is linear).
    ``log_dropped`` runs one small extra job to log what was dropped.

    .. note:: Since round 3 the cap is **default-on** (``max_bucket=100_000``)
       — the default changed from exact candidate generation to
       subset-under-degeneracy semantics. Callers that need the exact pair
       set regardless of bucket size must pass ``max_bucket=None``
       explicitly; ``embedding_neardup_pairs`` made the same change."""
    r = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(text_col, shingle_n), num_hashes, hash_mode).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.element_at("sig", b * r + j + 1).cast("string") for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    if max_bucket is not None:
        from .similarity import cap_buckets, oversized_buckets

        if log_dropped:
            import logging

            dropped = oversized_buckets(banded, ["band", "bucket"], max_bucket).collect()
            if dropped:
                logging.getLogger(__name__).warning(
                    "minhash_lsh_candidates: dropping %d oversized bucket(s) "
                    "(max_bucket=%d)", len(dropped), max_bucket,
                )
        banded = cap_buckets(banded, ["band", "bucket"], max_bucket)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shared-shingle self-join — the
    verification step behind MinHash candidates (or standalone at moderate
    scale). Returns (a, b, jaccard) with a < b and jaccard ≥ threshold.

    ``max_df`` caps shingle document frequency before the self-join: one
    stop-shingle shared by d docs creates d² join rows (10⁶ docs → 10¹²
    rows), so drop shingles with df > max_df from the *join* while keeping
    them in the per-doc sizes — the standard DF-cap that bounds the
    candidate blowup at the cost of slightly under-estimating |∩| (hence
    jaccard) for pairs sharing only ubiquitous shingles. The finite default
    makes the safe behavior opt-out, not opt-in: pass an explicit
    ``max_df=None`` to opt into exact semantics (safe only at moderate
    scale / post-MinHash — a 10⁶-doc stop-shingle is 10¹² join rows)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("s")
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = sh
    if max_df is not None:
        hot = sh.groupBy("s").agg(F.count("*").alias("_df")).filter(F.col("_df") > max_df)
        joinable = sh.join(F.broadcast(hot.select("s")), "s", "left_anti")
    inter = (
        joinable.alias("l")
        .join(joinable.alias("r"), (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash64(text_col, token_regex: str = r"\s+", hash_mode: str = "xxhash64"):
    """64-bit SimHash of a text column, all-native: per-token 64-bit hash,
    each bit votes ±1, signature bit = majority sign. Returns bigint.
    ``hash_mode='md5_60'`` gives an engine-portable 60-bit variant (bits
    60-63 always 0) for oracle-checked runs.

    Single-pass shape (round-6 optimization; values unchanged, pinned by
    the dedup_simhash oracle and a old-vs-new pytest): the previous form
    ran SIXTY-FOUR separate folds — one per bit — each re-inlining the
    tokenize+hash subtree (no common-subexpression elimination inside one
    projection's expression tree). Now one fold carries a 64-wide vote
    array, and the signature is assembled from the let-bound vote array."""
    from .textstats import _let

    masks = [1 << b if b < 63 else -(2**63) for b in range(64)]
    toks = F.filter(F.split(normalized_text(text_col), token_regex), lambda t: t != "")
    hashes = F.transform(toks, lambda t: hash64(t, 0, hash_mode))
    zeros = F.array(*[F.lit(0).cast("long")] * 64)
    votes = F.aggregate(
        hashes,
        zeros,
        # h is a lambda variable — already a bound value, so the 64
        # bit-tests below read it without recomputation
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(h.bitwiseAND(F.lit(m)) != 0, F.lit(1).cast("long")).otherwise(
                        F.lit(-1).cast("long")
                    )
                    for m in masks
                ]
            ),
            lambda a, v: a + v,
        ),
    )

    def _assemble(v: Column) -> Column:
        sig = F.lit(0).cast("long")
        for b in range(64):
            bitval = F.lit(1 << b) if b < 63 else F.lit(-(2**63))
            sig = sig + F.when(F.element_at(v, b + 1) > 0, bitval).otherwise(
                F.lit(0).cast("long")
            )
        return sig

    return _let(votes, _assemble)


def _block_bounds(blocks: int) -> list[int]:
    """Bit boundaries partitioning ALL 64 bits into ``blocks`` near-equal
    pieces (block i covers [bounds[i], bounds[i+1]))."""
    return [64 * i // blocks for i in range(blocks + 1)]


def hamming_candidates_from_sigs(
    sig: DataFrame, max_hamming: int = 3, blocks: int = 4,
    max_bucket: int | None = 100_000, log_dropped: bool = False,
) -> DataFrame:
    """Blocked Hamming join over an (id, sig) relation.

    Pigeonhole guarantee: the blocks PARTITION all 64 bits, so any pair with
    Hamming distance ≤ blocks-1 leaves at least one block untouched → shares
    an exact block key → found by the equi-join. ``blocks`` is auto-raised
    to ``max_hamming + 1`` when the caller's value would break that
    precondition (the round-1 default of 4 blocks with max_hamming=8
    silently dropped true pairs at distance 4-8).

    ``max_bucket`` is the hot-bucket guard shared with the other LSH
    self-joins: a (blk, key) bucket holding > max_bucket signatures (e.g. a
    corpus of near-identical boilerplate) would make the equi-join quadratic
    in that bucket, so its rows are dropped from the join (broadcast
    anti-join of the few hot keys). A pair whose ONLY shared block was
    dropped is lost — subset semantics under the cap; pass
    ``max_bucket=None`` for the exact pigeonhole guarantee."""
    if blocks < max_hamming + 1:
        blocks = max_hamming + 1
    bounds = _block_bounds(blocks)
    blocked = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sig", bounds[i])
                        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.blk", "bb.key")
    if max_bucket is not None:
        from .similarity import cap_buckets, oversized_buckets

        if log_dropped:
            import logging

            dropped = oversized_buckets(blocked, ["blk", "key"], max_bucket).collect()
            if dropped:
                logging.getLogger(__name__).warning(
                    "simhash blocked join: dropping %d oversized (blk,key) buckets "
                    "(max_bucket=%d)", len(dropped), max_bucket,
                )
        blocked = cap_buckets(blocked, ["blk", "key"], max_bucket)
    return (
        blocked.alias("l")
        .join(
            blocked.alias("r"),
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_hamming_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
    blocks: int = 4, hash_mode: str = "xxhash64", max_bucket: int | None = 100_000,
) -> DataFrame:
    """SimHash near-dup candidates: block the 64-bit signature; by
    pigeonhole (blocks partition the bits and are auto-raised to
    max_hamming+1), any pair within ``max_hamming`` shares at least one
    exact block → equi-join per block, then exact Hamming filter via
    bit_count(xor). With ``max_bucket=None`` the blocking is a pure
    optimization (returned set is exactly {pairs with hamming ≤
    max_hamming}); the finite default additionally drops degenerate hot
    (blk,key) buckets — see ``hamming_candidates_from_sigs``."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(text_col, hash_mode=hash_mode).alias("sig"))
    return hamming_candidates_from_sigs(
        sig, max_hamming=max_hamming, blocks=blocks, max_bucket=max_bucket
    )


def _word_ngrams(text_col, n: int):
    """Distinct word n-grams of a text column as an array (native exprs);
    empty for texts shorter than ``n`` (guard in word_ngram_array)."""
    from .textstats import word_ngram_array

    toks = F.filter(F.split(F.trim(text_col), r"\s+"), lambda t: t != "")
    return F.array_distinct(word_ngram_array(toks, n))


def ngram_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 13,
    corpus_id: str = "doc_id",
    probe_id: str = "probe_id",
    text_col: str = "text",
    broadcast_probes: bool = True,
) -> DataFrame:
    """Benchmark-contamination detection: for each (corpus doc, probe) pair,
    the count and fraction of the probe's distinct word ``n``-grams that
    appear verbatim in the doc — the standard decontamination primitive
    (n-gram collision against held-out eval sets; GPT-3 appendix C /
    PaLM-style 13-gram rule).

    Scale shape: both sides shingle to DISTINCT n-grams (explode), then one
    equi-join on the n-gram. The probe side is benchmark-sized, so it
    broadcasts by default — the corpus is never shuffled, the scan stays one
    pass, and the output is bounded by actual collisions. Returns
    (corpus_id, probe_id, n_overlap, probe_ngrams, contamination) for pairs
    with at least one collision.
    """
    c_ng = corpus.select(
        F.col(corpus_id), F.explode(_word_ngrams(F.col(text_col), n)).alias("ngram")
    )
    p_sh = probes.select(
        F.col(probe_id), _word_ngrams(F.col(text_col), n).alias("ngrams")
    ).withColumn("probe_ngrams", F.size("ngrams"))
    p_ng = p_sh.select(probe_id, "probe_ngrams", F.explode("ngrams").alias("ngram"))
    if broadcast_probes:
        p_ng = F.broadcast(p_ng)
    return (
        c_ng.join(p_ng, "ngram")
        .groupBy(corpus_id, probe_id, "probe_ngrams")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            corpus_id,
            probe_id,
            "n_overlap",
            "probe_ngrams",
            (F.col("n_overlap") / F.col("probe_ngrams")).alias("contamination"),
        )
    )


def paragraph_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_re: str = r"\n{2,}",
    min_chars: int = 1,
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/RefinedWeb within-corpus
    boilerplate primitive): split documents into paragraphs on ``sep_re``,
    hash each normalized paragraph, and aggregate cross-document occurrence
    counts. Returns (para_hash, n_docs, n_total, canonical_doc); rows with
    n_docs > 1 are the shared paragraphs a curation pass would drop or keep
    once.

    Plan at scale: one explode inside the document scan, then the standard
    two-stage exact-distinct aggregation Catalyst plans for
    countDistinct — partial combine on (para_hash, doc_id), exchange,
    rollup by para_hash. Both shuffles move already-aggregated
    (paragraph, doc) rows, never raw occurrence rows; no joins, no Python.
    (Use approx_count_distinct in the caller if one shuffle matters more
    than exact n_docs.)
    """
    paras = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), sep_re)).alias("para"),
    ).select("doc_id", normalized_text(F.col("para")).alias("para"))
    paras = paras.filter(F.length("para") >= min_chars)
    return (
        paras.select("doc_id", F.sha2(F.col("para"), 256).alias("para_hash"))
        .groupBy("para_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


def strip_duplicate_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_re: str = r"\n{2,}",
    min_chars: int = 1,
) -> DataFrame:
    """The ACTION for paragraph-level dedup (what paragraph_duplicates
    detects): remove every paragraph occurrence except the corpus-wide
    FIRST one — CCNet's boilerplate-removal rule, first = lowest
    (doc_id, paragraph_index). Paragraphs compare by normalized text
    (lowercase, whitespace collapsed) but documents rebuild from the
    ORIGINAL paragraph text, kept occurrences joined with a blank line.
    Returns one row per input document: (doc_id, n_paras, n_kept,
    clean_text) — n_paras counts non-empty paragraphs, and a document
    whose every paragraph was stripped (or that had none) comes back with
    clean_text = ''.

    Plan at scale: the canonical-first table is a partial-aggregated
    ``groupBy(norm).agg(min(struct(doc_id, pidx)))`` — the same skew-safe
    shape as exact_duplicates (a viral boilerplate paragraph collapses
    map-side; no window over the hash); the join back is an equi-join on
    the normalized paragraph (AQE-skew-splittable); then ONE
    partial-aggregated groupBy(doc_id) rebuilds documents, and a left
    join restores zero-paragraph docs.
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    occ = (
        base.select(
            "doc_id", F.posexplode(F.split("text", sep_re)).alias("pidx", "para")
        )
        .withColumn("norm", normalized_text(F.col("para")))
        .filter(F.length("norm") >= min_chars)
    )
    canon = occ.groupBy("norm").agg(
        F.min(F.struct("doc_id", "pidx")).alias("first")
    )
    flagged = occ.join(canon, "norm").withColumn(
        "keep",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pidx") == F.col("first.pidx")),
    )
    rebuilt = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("pidx", "para")))
                ),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("clean_text"),
    )
    return base.select("doc_id").join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def substring_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 64,
    stride: int = 16,
    max_df: int | None = 1000,
    min_span: int | None = None,
    max_gap: int | None = None,
) -> DataFrame:
    """Cross-document verbatim substring spans — the scale-shaped
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; the exact
    method builds a corpus-wide suffix array, which does not distribute).

    Shingle positions are CONTENT-DEFINED (winnowing-family selection,
    Schleimer et al. SIGMOD'03): a fixed-length character shingle is
    sampled wherever the 2-hex-char prefix of md5(shingle) falls below
    256/stride — expected density 1/stride, and, critically,
    alignment-invariant: a fixed positional grid would only detect copies
    whose offset difference is a multiple of the stride, while a predicate
    on the shingle's own content selects the SAME relative positions inside
    any verbatim copy of a span regardless of where it lands. Two documents
    sharing a span of s chars then share a sampled shingle on a common
    alignment diagonal with probability 1 - (1-1/stride)^(s-shingle_len+1)
    (≈ 99.98%% for a 200-char span at the defaults); adjacent collisions on
    one diagonal (gap <= max_gap, default 8*stride — geometric-tail split
    probability ~3e-4 per probe) merge into one maximal run. Reported
    spans are lower bounds on the true shared extent. Deterministic given
    content; md5 is used (not xxhash64) because every SQL engine computes
    the identical hex digest, keeping the operator oracle-checkable.

    Plan at scale: selection runs INSIDE the scan as one array expression
    (sequence -> filter on md5 prefix) — only selected positions are ever
    exploded into rows, so the shuffle moves ~len/stride rows per doc, not
    one per character. The cross-document equi-join is bucketed by shingle
    value with document frequency capped at ``max_df`` first (a boilerplate
    shingle in 10^6 docs would otherwise join quadratically — same
    default-on cap semantics as ngram_jaccard_pairs); run-merging windows
    partition on (doc_a, doc_b, diagonal), bounded by doc_len/stride,
    never by corpus size.

    Returns (a, b, a_start, b_start, span_len) with a < b, 1-based starts,
    one row per maximal run; ``min_span`` filters short spans (default:
    keep all, i.e. >= shingle_len).
    """
    if 256 % stride != 0 or not 2 <= stride <= 256:
        raise ValueError("stride must be a power of two in [2, 256] (hex-prefix selector)")
    sel_threshold = format(256 // stride, "02x")
    if max_gap is None:
        max_gap = 8 * stride
    n = F.length(F.col(text_col))
    positions = F.when(
        n >= shingle_len,
        F.filter(
            F.sequence(F.lit(1), n - shingle_len + 1),
            lambda i: F.substring(
                F.md5(F.substring(F.col(text_col), i, F.lit(shingle_len))), 1, 2
            )
            < sel_threshold,
        ),
    ).otherwise(F.array().cast("array<int>"))
    sh = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        F.explode(positions).alias("pos"),
    ).select(
        "id", "pos", F.substring(F.col("_t"), F.col("pos"), F.lit(shingle_len)).alias("sh")
    )
    if max_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.countDistinct("id").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    pairs = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.sh") == F.col("r.sh")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.pos").alias("pos_a"),
            (F.col("l.pos") - F.col("r.pos")).alias("diag"),
        )
        .distinct()
    )
    w = W.partitionBy("a", "b", "diag").orderBy("pos_a")
    gap = F.col("pos_a") - F.lag("pos_a").over(w)
    runs = pairs.withColumn(
        "_new", F.when(gap.isNull() | (gap > max_gap), 1).otherwise(0)
    ).withColumn("run_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    out = (
        runs.groupBy("a", "b", "diag", "run_id")
        .agg(F.min("pos_a").alias("a_start"), F.max("pos_a").alias("_last"))
        .select(
            "a",
            "b",
            "a_start",
            (F.col("a_start") - F.col("diag")).alias("b_start"),
            (F.col("_last") - F.col("a_start") + shingle_len).alias("span_len"),
        )
    )
    if min_span is not None:
        out = out.filter(F.col("span_len") >= min_span)
    return out


def strip_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The dedup ACTION for substring_duplicate_spans (Lee et al. 2022
    remove the duplicated substrings, keeping one occurrence): splice each
    detected span out of the HIGHER-id document — the a < b convention
    keeps the min-id occurrence, the same canonical rule exact_duplicates
    uses. Returns ``docs`` with ``text_col`` replaced by the spliced text.

    Plan at scale: spans aggregate to one interval-list row per affected
    doc (dimension-shaped relative to the corpus); the splice itself is a
    single native ``aggregate`` fold over the sorted intervals — a cursor
    walk that naturally handles overlapping/adjacent intervals — so the
    corpus is touched in one pass with no Python and no extra shuffle
    beyond the interval groupBy.
    """
    iv = spans.groupBy(F.col("b").alias(id_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("b_start").alias("s"), F.col("span_len").alias("l"))
            )
        ).alias("_iv")
    )
    d = docs.join(iv, id_col, "left")
    t = F.col(text_col)

    def splice(ivs):
        acc0 = F.struct(F.lit("").alias("out"), F.lit(1).alias("cur"))

        def step(acc, x):
            keep_len = F.greatest(x["s"] - acc["cur"], F.lit(0))
            return F.struct(
                F.concat(acc["out"], F.substring(t, acc["cur"], keep_len)).alias("out"),
                F.greatest(acc["cur"], x["s"] + x["l"]).alias("cur"),
            )

        def fin(acc):
            tail_len = F.greatest(F.length(t) - acc["cur"] + 1, F.lit(0))
            return F.concat(acc["out"], F.substring(t, acc["cur"], tail_len))

        return F.aggregate(ivs, acc0, step, fin)

    return d.withColumn(
        text_col, F.when(F.col("_iv").isNull(), t).otherwise(splice(F.col("_iv")))
    ).drop("_iv")


def fuzzy_dedup_verdicts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """The dedup ACTION for the MinHash family: a keep/drop verdict per
    document from LSH candidate pairs chained through the distributed
    union-find — the standard fuzzy-dedup workflow (MinHash banding per
    Leskovec/Rajaraman/Ullman MMDS ch.3; cluster-then-keep-one as applied
    to LLM corpora by Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"). Completes detect→act for MinHash the way
    ``strip_duplicate_spans`` does for substring dedup and
    ``strip_duplicate_paragraphs`` does for paragraph dedup.

    Returns one row per input document: ``(id_col, cluster_id, keep)`` where
    ``cluster_id`` is the component's canonical (min) id — a singleton doc is
    its own cluster — and ``keep`` is true exactly for the canonical member.
    ``df.join(verdicts, id_col).filter("keep")`` is the filtered corpus.

    Plan at scale: the component map covers only documents that appear in at
    least one candidate pair — a small fraction of a real corpus — so the
    final step is one hash join (AQE-splittable, broadcast when the cluster
    map is dimension-sized) against the full document set; the corpus text
    itself is scanned once by the signature stage and never shuffled.
    ``max_bucket`` semantics are inherited from ``minhash_lsh_candidates``
    (default-on hot-bucket cap ⇒ subset-under-degeneracy candidates).
    """
    from .canonicalize import connected_components

    pairs = minhash_lsh_candidates(
        df,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        hash_mode=hash_mode,
        max_bucket=max_bucket,
    )
    comp = connected_components(pairs, src="a", dst="b").select(
        F.col("node_id").alias(id_col), F.col("canonical_id").alias("_canon")
    )
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("_canon", F.col(id_col)).alias("cluster_id"),
            (F.col("_canon").isNull() | (F.col(id_col) == F.col("_canon"))).alias("keep"),
        )
    )
