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

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def normalized_text(col="text"):
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: returns (doc_id, content_hash,
    canonical_id, is_dup). One shuffle (the window on content_hash)."""
    h = F.sha2(normalized_text(text_col), 256)
    w = W.partitionBy("content_hash")
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
    )


def shingles(col, n: int = 5):
    """Word n-gram shingle array (distinct) from text — native exprs."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(normalized_text(c), " ")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(normalized_text(c))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def minhash_signature(shingle_col, num_hashes: int = 32):
    """MinHash signature: sig[i] = min over shingles of xxhash64(s, seed=i).
    Returns array<bigint> of length num_hashes; empty shingle set → nulls."""
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col

    def one(seed: int):
        # closure, NOT a default lambda arg: pyspark binds extra lambda
        # params to the array-index variable, silently breaking the seed
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed))))

    return F.array(*[one(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (a < b), deduplicated across
    bands. rows_per_band = num_hashes // bands; two docs are candidates when
    any band's signature slice matches exactly — the classic banding scheme
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3)."""
    r = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(text_col, shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.element_at("sig", b * r + j + 1) for j in range(r)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
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
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shared-shingle self-join — the
    verification step behind MinHash candidates (or standalone at moderate
    scale). Returns (a, b, jaccard) with a < b and jaccard ≥ threshold."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("s")
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("l")
        .join(sh.alias("r"), (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
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


def simhash64(text_col, token_regex: str = r"\s+"):
    """64-bit SimHash of a text column, all-native: per-token xxhash64, each
    bit votes ±1, signature bit = majority sign. Returns bigint."""
    toks = F.filter(F.split(normalized_text(text_col), token_regex), lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(b: int):
        mask = 1 << b if b < 63 else -(2**63)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    bit_votes = [vote(b) for b in range(64)]
    sig = F.lit(0).cast("long")
    for b, v in enumerate(bit_votes):
        bitval = F.lit(1 << b) if b < 63 else F.lit(-(2**63))
        sig = sig + F.when(v > 0, bitval).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_hamming_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: block the 64-bit signature into
    ``blocks`` 16-bit pieces; by pigeonhole, any pair within ``max_hamming``
    ≤ blocks-1 shares at least one exact block → equi-join per block, then
    exact Hamming filter via bit_count(xor)."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig"))
    width = 64 // blocks
    blocked = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sig", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.blk", "bb.key")
    pairs = (
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
    return pairs
