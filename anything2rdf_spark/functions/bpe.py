"""Real byte-pair-encoding tokenization (Sennrich et al. ACL 2016; the
greedy lowest-rank-first merge loop popularized by GPT-2's tokenizer) over
a SHIPPED merges table — no network, no external tokenizer package.

`bpe_ish_token_count` (textstats.py) stays the cheap native-regex stand-in
the DuckDB oracle can check; this module is the honest encoder for when the
count must match a real subword vocabulary: trainable (`train_bpe`), exact
greedy encoding (`bpe_encode`), and an Arrow-batched Spark column
(`bpe_token_count`) that ships the ranks table in the UDF closure (a few KB)
and memoizes per-word encodings per batch — the hot path at corpus scale is
dict lookups, not merge loops, because natural-language word frequency is
Zipfian.

DuckDB cannot express the iterative merge loop, so the Spark/oracle gate for
this operator is the pure-Python reference implementation in pytest
(test_textstats), not a driver SQL row — the same split the multimodal
decoders use.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column

# Pre-tokenizer: GPT-2-shaped word splitting with the leading-space
# convention (a space belongs to the token it precedes), restricted to the
# ASCII classes the native BPE_ISH_TOKEN_RE uses so the two counters segment
# text identically before the subword stage.
PRETOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")

# End-of-word marker (Sennrich et al. §3.2) — lets merges distinguish
# word-final from word-internal pairs ("er</w>" vs "er").
EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    return PRETOKEN_RE.findall(text)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def train_bpe(corpus: str, n_merges: int = 256) -> list[tuple[str, str]]:
    """Learn a merges table from ``corpus``: repeatedly merge the most
    frequent adjacent symbol pair (ties broken lexicographically, so
    training is deterministic on any platform). Classic Sennrich training —
    O(n_merges * vocab) on the word-frequency table, not on the corpus."""
    vocab = Counter(_word_symbols(w) for w in pretokenize(corpus) if not w.isspace())
    return train_bpe_from_vocab(vocab, n_merges)


def train_bpe_from_vocab(vocab: Counter, n_merges: int = 256) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a WEIGHTED word-symbol vocabulary
    (``Counter[tuple[str, ...]] -> freq``) — the driver-side half of
    :func:`train_bpe_distributed`; ``train_bpe`` is the single-string
    convenience wrapper. Deterministic: most-frequent pair first, ties
    broken lexicographically."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy encoding: repeatedly apply the LOWEST-RANK applicable merge
    (GPT-2's loop) until none applies. Deterministic for any ranks table."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict[tuple[str, str], int], cache: dict | None = None) -> int:
    """Token COUNT of ``text`` under the ranks table (whitespace
    pre-tokens are segmentation only — not counted, matching the
    BPE_ISH/ws-token convention). ``cache`` memoizes per-word counts."""
    n = 0
    for w in pretokenize(text):
        if w.isspace():
            continue
        if cache is not None and w in cache:
            n += cache[w]
            continue
        c = len(bpe_encode(w, ranks))
        if cache is not None:
            cache[w] = c
        n += c
    return n


def train_bpe_distributed(
    docs,
    n_merges: int = 256,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Tokenizer training AT CORPUS SCALE: the standard two-phase layout
    every production BPE trainer uses (Sennrich's own implementation
    aggregates a word-frequency dict first) — Spark computes the
    word-frequency table, the driver runs the merge loop on it.

    Phase 1 (distributed, one pass): pre-tokenize every document with the
    NATIVE ``regexp_extract_all`` (PRETOKEN_RE is ASCII-classed, so the
    Java and Python engines segment identically), explode, drop whitespace
    tokens, and partial-aggregate counts — the canonical map-side-combined
    word count. The shuffled relation is vocabulary-sized (Heaps' law:
    ~1e6-1e7 distinct words even at 100 TB), not corpus-sized.

    Phase 2 (driver): the ``max_words`` most frequent words (ties broken
    by word asc — a deterministic TakeOrderedAndProject, no global sort)
    feed :func:`train_bpe_from_vocab`. When the cap doesn't bind, the
    merges are EXACTLY those of single-string training over the per-doc
    pre-tokenization; when it binds, the dropped tail is the Zipfian tail
    whose pair counts are dominated by the head — the standard
    max-vocab-cap approximation.

    Note the per-doc boundary convention: each document's first word has
    no leading space (documents are independent texts, not one
    concatenated stream), so merges can differ from ``train_bpe`` on a
    "\\n".join of the same texts exactly at document boundaries.
    """
    from pyspark.sql import functions as F

    wf = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE.pattern), 0)
            ).alias("w")
        )
        .filter(~F.col("w").rlike(r"^\s+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: Counter = Counter()
    for r in wf:
        vocab[_word_symbols(r["w"])] += int(r["n"])
    return train_bpe_from_vocab(vocab, n_merges)


# A small fixed training corpus (public-domain-style plain English prose,
# written for this repo) — enough to learn the common English subwords the
# default table ships with. Determinism of train_bpe makes the default
# merges identical on every machine.
DEFAULT_CORPUS = (
    "the quick brown fox jumps over the lazy dog and runs to the old barn "
    "in the field where the farmer keeps the tools and the seeds for the "
    "spring planting season while the children walk along the river bank "
    "watching the water run under the wooden bridge toward the mill there "
    "is a long road from the village to the market town and the people "
    "carry baskets of bread and fruit every morning when the sun rises "
    "over the eastern hills the light falls on the stone houses and the "
    "narrow streets fill with the sound of carts and voices trading and "
    "talking about the weather the harvest and the news from the coast "
    "reading and writing were taught in the small school near the church "
    "where the teacher kept books about history nature and the stars"
)


@lru_cache(maxsize=1)
def default_merges() -> tuple[tuple[str, str], ...]:
    return tuple(train_bpe(DEFAULT_CORPUS, n_merges=256))


def encode_text_symbols(
    text: str, ranks: dict[tuple[str, str], int], cache: dict | None = None
) -> list[str]:
    """Subword SYMBOLS of ``text`` (whitespace pre-tokens are segmentation
    only, not emitted — same convention as encode_text's count)."""
    out: list[str] = []
    for w in pretokenize(text):
        if w.isspace():
            continue
        if cache is not None and w in cache:
            out.extend(cache[w])
            continue
        syms = bpe_encode(w, ranks)
        if cache is not None:
            cache[w] = syms
        out.extend(syms)
    return out


def bpe_symbols(text, merges: list[tuple[str, str]] | None = None) -> Column:
    """Arrow-batched real-BPE SYMBOL array column (the tokenize-to-subwords
    step training export needs, vs bpe_token_count's count). Same closure-
    shipped ranks table and per-batch word memoization."""
    from pyspark.sql import functions as F

    ranks = {p: i for i, p in enumerate(merges if merges is not None else default_merges())}

    @F.pandas_udf("array<string>")
    def _syms(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        return s.map(lambda t: [] if t is None else encode_text_symbols(t, ranks, cache))

    return _syms(text if isinstance(text, Column) else F.col(text))


def bpe_token_count(text, merges: list[tuple[str, str]] | None = None) -> Column:
    """Arrow-batched real-BPE token count column. The merges table rides the
    closure (a few KB broadcast with the task), encodings are memoized
    per-word within each executor batch — Zipfian word reuse makes the memo
    hit rate high, so the per-row cost approaches one dict lookup per word.

    Returns int32: the count is bounded by the document's character length,
    so overflow needs a single >2^31-char document — far beyond any real
    per-document bound (and the 2 GiB Arrow string-cell cap upstream).
    Documented here per r5 ADVICE rather than widened: matching ws_tokens'
    int keeps the curate_corpus schema stable."""
    from pyspark.sql import functions as F

    ranks = {p: i for i, p in enumerate(merges if merges is not None else default_merges())}

    @F.pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        return s.map(lambda t: 0 if t is None else encode_text(t, ranks, cache)).astype("int32")

    return _count(text if isinstance(text, Column) else F.col(text))
