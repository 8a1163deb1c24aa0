"""Round-6 optimization guards: the single-pass rewrites of simhash64 and
minhash_signature (operators/dedupe.py) must be value-identical to the
round-5 formulations (embedded here verbatim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators.dedupe import (
    hash64,
    minhash_signature,
    normalized_text,
    shingles,
    simhash64,
)


def _simhash64_r5(text_col, token_regex=r"\s+", hash_mode="xxhash64"):
    toks = F.filter(F.split(normalized_text(text_col), token_regex), lambda t: t != "")
    hashes = F.transform(toks, lambda t: hash64(t, 0, hash_mode))

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


def _minhash_signature_r5(shingle_col, num_hashes=32, hash_mode="xxhash64"):
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col

    def one(seed: int):
        return F.array_min(F.transform(sh, lambda s: hash64(s, seed, hash_mode)))

    return F.array(*[one(i) for i in range(num_hashes)])


def _shingles_r5(col, n=5):
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


FIXTURES = [
    None,
    "",
    "   ",
    "one",
    "one two three four five six seven eight",
    "the same the same the same the same the same words repeat here often",
    "Tabs\tand\nnewlines   collapse  to single spaces in the normalizer",
    "Ünïcode tökens ärë hashed büt never crash ünder xxhash",
    "a b c d e " * 40,
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in FIXTURES], "text string")


@pytest.mark.parametrize("mode", ["xxhash64", "md5_60"])
def test_simhash_matches_r5(docs, mode):
    rows = docs.select(
        "text",
        simhash64("text", hash_mode=mode).alias("new"),
        _simhash64_r5("text", hash_mode=mode).alias("old"),
    ).collect()
    for r in rows:
        assert r.new == r.old, f"simhash drift on {r.text!r}: {r.new} != {r.old}"


@pytest.mark.parametrize("mode", ["xxhash64", "md5_60"])
def test_minhash_and_shingles_match_r5(docs, mode):
    rows = docs.select(
        "text",
        shingles("text", 3).alias("sh_new"),
        _shingles_r5("text", 3).alias("sh_old"),
        minhash_signature(shingles("text", 3), 16, mode).alias("sig_new"),
        _minhash_signature_r5(_shingles_r5("text", 3), 16, mode).alias("sig_old"),
    ).collect()
    for r in rows:
        assert r.sh_new == r.sh_old, f"shingle drift on {r.text!r}"
        assert r.sig_new == r.sig_old, f"minhash drift on {r.text!r}"


def test_dsir_resample_threshold_prefilter_equals_direct(spark):
    """Round-6 large-k path: the approxQuantile prefilter must select the
    EXACT same set as the direct ORDER BY ... LIMIT k, and the optimized
    plan must carry the key_micro range filter."""
    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.curation import dsir_resample

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma "),
            F.when(F.pmod("id", 7) == 0, F.lit("target target target ")).otherwise(F.lit("")),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    kw = dict(target_mod=9, hash_mode="md5_60")
    direct = dsir_resample(docs, 40, threshold_prefilter=False, **kw)
    pre = dsir_resample(docs, 40, threshold_prefilter=True, **kw)
    want = sorted((r.doc_id, r.key_micro) for r in direct.collect())
    got = sorted((r.doc_id, r.key_micro) for r in pre.collect())
    assert got == want and len(got) == 40
    plan = pre._jdf.queryExecution().optimizedPlan().toString()
    assert "key_micro" in plan and ">=" in plan  # prefilter survived planning

    # degenerate: k >= n falls back to the direct path and returns all rows
    allrows = dsir_resample(docs, 1000, threshold_prefilter=True, **kw)
    assert allrows.count() == 500
