"""Dedup operators tested against brute-force pure-Python oracles on the
driver-provided documents table (sf0.001)."""

import itertools

import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators import dedupe as DD

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def py_shingles(text, n):
    toks = " ".join(text.lower().split()).split(" ")
    if len(toks) < n:
        return {" ".join(text.lower().split())}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["canonical_id"], r["is_dup"]) for r in DD.exact_duplicates(df).collect()}
    # case + whitespace normalize → 1 and 2 collide; canonical = min id
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (3, False)


def test_shingles_matches_oracle(spark, docs):
    sample = docs.limit(20)
    got = {
        r["doc_id"]: set(r["sh"])
        for r in sample.select("doc_id", DD.shingles("text", 3).alias("sh")).collect()
    }
    for r in sample.collect():
        assert got[r["doc_id"]] == py_shingles(r["text"], 3), r["doc_id"]


def test_ngram_jaccard_pairs_against_bruteforce(spark, docs):
    sample = docs.limit(60).cache()
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(sample, shingle_n=3, threshold=0.5).collect()
    }
    rows = [(r["doc_id"], py_shingles(r["text"], 3)) for r in sample.collect()]
    expected = {}
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            expected[(min(ia, ib), max(ia, ib))] = j
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-9


def test_minhash_lsh_finds_near_duplicates(spark):
    # near-duplicate pair (one word changed) + unrelated docs
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [(1, base), (2, base.replace("today", "tomorrow")), (3, "completely unrelated text about spark shuffles and joins"), (4, base)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r["a"], r["b"]) for r in DD.minhash_lsh_candidates(df, shingle_n=3, num_hashes=32, bands=16).collect()}
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides in ≥1 band
    assert (1, 3) not in pairs and (2, 3) not in pairs and (3, 4) not in pairs


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river shore"),
            (3, "spark partitions shuffle data across executors during wide joins"),
            (4, "the quick brown fox jumps over the lazy dog near the river bank"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["s"] for r in df.select("doc_id", DD.simhash64("text").alias("s")).collect()}
    assert sigs[1] == sigs[4]  # identical text → identical signature

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])

    cands = {(r["a"], r["b"]): r["hamming"] for r in DD.simhash_hamming_candidates(df, max_hamming=24).collect()}
    assert (1, 4) in cands and cands[(1, 4)] == 0
    assert (1, 2) in cands and cands[(1, 2)] == hamming(sigs[1], sigs[2])
    assert all(h <= 24 for h in cands.values())


def test_hamming_blocking_pigeonhole(spark):
    # two sigs at Hamming distance 5, the differing bits spread so that EVERY
    # 16-bit block differs — the round-1 fixed blocks=4 scheme missed this
    # pair at max_hamming >= 4; auto-raised blocks must find it
    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48) | (-(2**63))  # bit63 = sign bit
    sig = spark.createDataFrame([(1, a), (2, b), (3, ~0)], "id long, sig long")
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in DD.hamming_candidates_from_sigs(sig, max_hamming=5, blocks=4).collect()
    }
    assert got == {(1, 2): 5}


def test_hamming_blocking_covers_bit63(spark):
    # bit 63 (the sign bit) must be inside some block: pair differing ONLY
    # in bit 63 (hamming 1) is found, and key extraction handles negatives
    sig = spark.createDataFrame([(1, 0), (2, -(2**63))], "id long, sig long")
    got = [tuple(r) for r in DD.hamming_candidates_from_sigs(sig, max_hamming=1, blocks=4).collect()]
    assert got == [(1, 2, 1)]


def test_md5_60_hash_matches_duckdb(spark):
    import duckdb

    vals = ["alpha beta", "gamma", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", DD.hash64("s", seed=7, mode="md5_60").alias("h")).collect()}
    for v in vals:
        (expected,) = duckdb.sql(
            "SELECT ('0x' || substr(md5('7:' || ?), 1, 15))::BIGINT", params=[v]
        ).fetchone()
        assert got[v] == expected, v


def test_minhash_md5_mode_same_pairs_semantics(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [(1, base), (2, base), (3, "unrelated words entirely different content here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"])
        for r in DD.minhash_lsh_candidates(df, shingle_n=3, num_hashes=8, bands=4, hash_mode="md5_60").collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_jaccard_max_df_bounds_candidates(spark):
    # one ubiquitous shingle ("common words here") shared by all docs must
    # not create all-pairs candidates once capped
    docs = [(i, f"common words here unique{i} tail{i} extra{i}") for i in range(10)]
    docs.append((100, "common words here unique1 tail1 extra1"))  # true dup of doc 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = DD.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.5, max_df=3)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert got == {(1, 100)}
    # and the join input is provably bounded: no shingle with df>3 remains
    sh = df.select(F.col("doc_id").alias("id"), F.explode(DD.shingles("text", 3)).alias("s")).distinct()
    assert sh.groupBy("s").count().filter("count > 3").count() > 0  # the hot shingle exists


def test_exact_dedup_on_documents_table(spark, docs):
    out = DD.exact_duplicates(docs)
    n = docs.count()
    assert out.count() == n
    assert out.filter(F.col("is_dup")).count() == n - out.select("canonical_id").distinct().count()


def test_ngram_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "totally different words here now"),
        ],
        "doc_id int, text string",
    )
    probes = spark.createDataFrame(
        [
            ("exact", "alpha beta gamma delta epsilon"),  # verbatim -> 1.0
            ("part", "beta gamma delta zzz yyy xxx"),     # 1 of 4 trigrams
            ("none", "qq ww ee rr tt"),                   # no collision -> no row
        ],
        "probe_id string, text string",
    )
    got = {
        (r["doc_id"], r["probe_id"]): (r["n_overlap"], r["probe_ngrams"], r["contamination"])
        for r in DD.ngram_contamination(corpus, probes, n=3).collect()
    }
    assert got[(1, "exact")] == (3, 3, 1.0)
    assert got[(1, "part")] == (1, 4, 0.25)
    assert all(p != "none" for (_, p) in got)


def test_paragraph_duplicates(spark):
    rows = [
        (1, "intro one\n\nshared footer\n\nalpha"),
        (2, "intro two\n\nshared footer"),
        # same footer under different case/whitespace: normalization folds it
        (3, "Shared   FOOTER\n\n\nbeta"),
    ]
    out = DD.paragraph_duplicates(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    rows_out = out.collect()
    shared = [r for r in rows_out if r["n_docs"] > 1]
    assert len(shared) == 1
    r = shared[0]
    assert (r["n_docs"], r["n_total"], r["canonical_doc"]) == (3, 3, 1)
    # 4 distinct unique paragraphs besides the shared one
    assert len(rows_out) == 5


def test_substring_duplicate_spans(spark):
    """Content-defined sampling finds a planted 200-char cross-document
    span even when the offset difference is NOT a multiple of the stride
    (a positional grid would miss it); unrelated docs yield no pairs;
    texts shorter than the shingle survive (sequence guard); the max_df
    cap excludes boilerplate shared by too many docs."""
    import hashlib

    from anything2rdf_spark.operators.dedupe import substring_duplicate_spans

    def noise(tag, n):
        out, i = [], 0
        while sum(map(len, out)) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    span = noise("s", 200)
    boiler = noise("bp", 150)
    rows = [
        (1, noise("a", 313) + span + noise("a2", 91)),   # span at 314
        (2, noise("b", 53) + span + noise("b2", 400)),   # span at 54, diag 260 % 16 != 0
        (3, noise("c", 500)),                            # unrelated
        (8, "tiny"),                                     # shorter than shingle
        (4, noise("d", 100) + boiler + noise("d2", 100)),
        (5, noise("e", 100) + boiler + noise("e2", 100)),
        (6, noise("f", 100) + boiler + noise("f2", 100)),
        (7, noise("g", 100) + boiler + noise("g2", 100)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_duplicate_spans(df, shingle_len=32, stride=16, max_df=3).collect()
    got = {(r["a"], r["b"]): r for r in out}
    assert set(got) == {(1, 2)}  # boilerplate pairs capped away, no spurious pairs
    r = got[(1, 2)]
    assert r["a_start"] - r["b_start"] == 260  # true diagonal recovered
    assert 314 <= r["a_start"] <= 314 + 199 - 32  # start inside the span
    assert 32 <= r["span_len"] <= 200            # lower bound on true extent
    # without the cap the boilerplate pairs appear on their own diagonal
    uncapped = substring_duplicate_spans(df, shingle_len=32, stride=16, max_df=None)
    pairs = {(r["a"], r["b"]) for r in uncapped.collect()}
    assert (4, 5) in pairs and (1, 2) in pairs
    # deterministic under repartition
    out2 = substring_duplicate_spans(
        df.repartition(7), shingle_len=32, stride=16, max_df=3
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    with pytest.raises(ValueError):
        substring_duplicate_spans(df, stride=10)


def test_strip_duplicate_spans(spark):
    """The splice removes each detected span from the higher-id doc only:
    the min-id occurrence survives verbatim, the copy's surroundings stay
    intact, lengths reconcile exactly, and docs without spans pass
    through unchanged (including overlapping-interval folding)."""
    import hashlib

    from anything2rdf_spark.operators.dedupe import (
        strip_duplicate_spans,
        substring_duplicate_spans,
    )

    def noise(tag, n):
        out, i = [], 0
        while sum(map(len, out)) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    span = noise("s2", 200)
    rows = [
        (1, noise("p", 313) + span + noise("p2", 91)),
        (2, noise("q", 53) + span + noise("q2", 400)),
        (3, noise("r", 500)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = substring_duplicate_spans(df, shingle_len=32, stride=16)
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(df, spans).collect()}
    orig = dict(rows)
    assert got[1] == orig[1] and got[3] == orig[3]     # canonical + unrelated intact
    assert span in got[1] and span not in got[2]        # copy removed, original kept
    removed = sum(r["span_len"] for r in spans.collect())
    assert len(got[2]) == len(orig[2]) - removed        # exact splice arithmetic
    assert got[2].startswith(orig[2][:40])              # prefix outside span intact
    assert got[2].endswith(orig[2][-40:])               # suffix outside span intact
    # overlapping intervals fold via the cursor walk: feed synthetic spans
    manual = spark.createDataFrame(
        [(1, 3, 10, 10, 20), (1, 3, 10, 20, 20)], "a long, b long, a_start int, b_start int, span_len int"
    )
    out3 = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(df, manual).collect()}
    assert out3[3] == orig[3][:9] + orig[3][39:]        # union [10,39] removed once


def test_strip_duplicate_paragraphs(spark):
    """First-occurrence-wins across docs; case/ws folds for comparison but
    originals rebuild; fully-stripped and paragraph-less docs come back
    with clean_text = ''."""
    from anything2rdf_spark.operators.dedupe import strip_duplicate_paragraphs

    rows = [
        (1, "intro one\n\nShared Footer\n\nbody alpha"),
        (2, "intro two\n\nshared   footer"),      # footer folds -> stripped
        (3, "SHARED FOOTER"),                      # only para is a dup -> ''
        (4, ""),                                   # no paragraphs at all
        (5, "intro one"),                          # dup of doc 1's first para
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in strip_duplicate_paragraphs(df).collect()
    }
    assert got[1] == (3, 3, "intro one\n\nShared Footer\n\nbody alpha")
    assert got[2] == (2, 1, "intro two")
    assert got[3] == (1, 0, "")
    assert got[4] == (0, 0, "")
    assert got[5] == (1, 0, "")


def test_strip_duplicate_paragraphs_plan_shape(spark):
    from anything2rdf_spark.operators.dedupe import strip_duplicate_paragraphs

    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    plan = (
        strip_duplicate_paragraphs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # canonical-first must be the skew-safe agg


def test_fuzzy_dedup_verdicts(spark):
    """Near-identical docs cluster transitively; exactly the min-id member
    of each cluster keeps; singletons keep themselves as their own cluster."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base + " again"),                    # near-dup of 1
        (3, base.replace("quick", "quick red")), # near-dup of 1 (and of 2 via 1)
        (4, "completely unrelated text about distributed query engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in DD.fuzzy_dedup_verdicts(df, shingle_n=3, num_hashes=16, bands=8).collect()
    }
    assert len(got) == 4                      # one verdict per input doc
    assert got[4] == (4, True)                # singleton keeps itself
    assert got[1] == (1, True)                # canonical member of the cluster
    assert got[2] == (1, False) and got[3] == (1, False)
    # the filtered corpus is exactly the canonical members
    kept = {r["doc_id"] for r in DD.fuzzy_dedup_verdicts(
        df, shingle_n=3, num_hashes=16, bands=8
    ).filter("keep").collect()}
    assert kept == {1, 4}


def test_url_duplicates_canonicalization(spark):
    from anything2rdf_spark.operators.dedupe import url_duplicates

    rows = [
        (1, "https://www.Example.com/Path/?utm_source=x&q=1#frag"),
        (2, "http://example.com/Path?q=1"),            # dup of 1
        (3, "https://example.com:443/Path/?q=1&gclid=zz"),  # dup of 1
        (4, "https://example.com/path?q=1"),           # path case differs: distinct
        (5, "https://other.org/"),
        (6, "https://other.org"),                      # dup of 5
        (7, "https://example.com/Path?q=2"),           # different query: distinct
        # tracking-param names as SUBSTRINGS must survive (anchored strip)
        (8, "https://example.com/p?not_gclid=5"),
        (9, "https://example.com/p?xgclid=1&q=2"),
        (10, "https://example.com/buygclid=7/page"),
        (11, "https://example.com/p?utm_a=1&utm_b=2&q=3"),  # dup of 12
        (12, "https://example.com/p?q=3"),
        (13, None),                                    # null url passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: (r["canonical_url"], r["canonical_id"], r["is_dup"])
           for r in url_duplicates(df).collect()}
    assert got[1] == ("example.com/Path?q=1", 1, False)
    assert got[2] == ("example.com/Path?q=1", 1, True)
    assert got[3] == ("example.com/Path?q=1", 1, True)
    assert got[4][0] == "example.com/path?q=1" and not got[4][2]
    assert got[5] == ("other.org", 5, False)
    assert got[6] == ("other.org", 5, True)
    assert not got[7][2]
    assert got[8] == ("example.com/p?not_gclid=5", 8, False)
    assert got[9] == ("example.com/p?xgclid=1&q=2", 9, False)
    assert got[10] == ("example.com/buygclid=7/page", 10, False)
    assert got[11] == ("example.com/p?q=3", 11, False)
    assert got[12] == ("example.com/p?q=3", 11, True)
    assert got[13] == (None, 13, False)  # null url: kept, own canonical


def test_novel_documents_cross_snapshot(spark):
    from anything2rdf_spark.operators.dedupe import normalized_text, novel_documents

    seen_src = spark.createDataFrame(
        [(100, "previously crawled page text"), (101, "another old page")],
        "doc_id long, text string",
    )
    seen = seen_src.select(F.sha2(normalized_text("text"), 256).alias("content_hash"))
    new = spark.createDataFrame(
        [
            (1, "a genuinely new page appears"),
            (2, "Previously   CRAWLED page text"),   # normalizes to a seen hash
            (3, "a genuinely new page appears"),     # in-batch dup of 1
            (4, "another fresh one entirely"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in novel_documents(new, seen).collect()}
    assert got == {1, 4}
    # idempotence: feeding survivors' hashes back as the snapshot leaves nothing
    surv = novel_documents(new, seen).select("content_hash")
    again = novel_documents(new, seen.unionByName(surv))
    assert again.count() == 0
