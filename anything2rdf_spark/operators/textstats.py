"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All-native expressions — these run
in the same scan as extraction at 100 TB."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language high-frequency stopword lists for the stopword-hit heuristic.
# The argmax design scales to any number of languages for free (one native
# array expression per language, same scan); extend by adding a row here —
# the DuckDB oracle in __spark_entry__ is generated from this dict.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "with", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "auf", "ein", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "avec", "pour", "dans", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "con", "para", "en", "un", "una"],
    "it": ["il", "lo", "gli", "che", "di", "per", "con", "non", "una", "sono"],
    "pt": ["o", "os", "as", "do", "da", "em", "para", "com", "não", "uma"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "voor", "met", "zijn"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "inte"],
    "fi": ["ja", "on", "ei", "että", "oli", "hän", "joka", "mutta", "kun", "myös"],
    "pl": ["i", "nie", "to", "się", "na", "że", "jest", "do", "z", "jak"],
    "tr": ["ve", "bir", "bu", "için", "ile", "olarak", "da", "ne", "gibi", "çok"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"],
}

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"

# Unicode-script character classes for the script-counting pre-stage of
# lang_id (r4 verdict item 3): the stopword argmax is structurally blind to
# unsegmented / non-Latin scripts (tokens never match, everything falls to
# 'und'), so zh/ja/ko/ar/ru/el are decided by counting script characters
# natively (regexp_count — one codegen expression, no UDF). Each entry is
# (name, java_char_class_body, re2_char_class_body): Spark compiles Java
# regex (\p{IsHan}), the DuckDB oracle compiles RE2 (\p{Han}).
SCRIPT_CLASSES = [
    ("kana", r"\p{IsHiragana}\p{IsKatakana}", r"\p{Hiragana}\p{Katakana}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("hangul", r"\p{IsHangul}", r"\p{Hangul}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
]

# Script-branch languages and their scores over the script counts. Japanese
# text mixes kana and Han, so plain per-script argmax would call it 'zh'
# (Han chars usually outnumber kana): ja scores kana+han but ONLY when kana
# is present — kana is unique to Japanese, and a zero guard keeps pure-Han
# (Chinese) text from tying with it.
SCRIPT_LANGS = ["ar", "el", "ja", "ko", "ru", "zh"]  # sorted: argmax tie-break order


def _c(c):
    return F.col(c) if isinstance(c, str) else c


def ws_token_count(text) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(_c(text))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text) -> Column:
    """BPE-ish subword count: letter runs + short digit runs + single
    punctuation, via one regexp_extract_all (native)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_TOKEN_RE), 0)).cast("int")


def script_aware_token_count(text) -> Column:
    """Token count that stays meaningful on unsegmented scripts: Han and
    kana text carries no spaces, so ``ws_token_count`` calls a whole
    Chinese/Japanese sentence ONE token — the same blindness the script
    pre-stage fixed for lang_id. The standard heuristic (used by the mC4 /
    PaLM data-accounting tradition): each Han/Hiragana/Katakana character
    counts as one token, everything else whitespace-counts after those
    characters are blanked. Hangul, Arabic, Cyrillic and Greek are
    space-segmented, so they stay on the whitespace path. One native
    regexp_count + regexp_replace — codegen-stage, no UDF."""
    t = _c(text)
    cjk = r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}]"
    return (
        F.regexp_count(t, F.lit(cjk)) + ws_token_count(F.regexp_replace(t, cjk, " "))
    ).cast("int")


def _tokens(text) -> Column:
    return F.filter(F.split(F.lower(_c(text)), r"[^\p{L}]+"), lambda t: t != "")


def stopword_hits(text, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(_tokens(text), lambda t: F.array_contains(sw, t)))


def script_counts(text) -> dict[str, Column]:
    """Per-script character counts (native regexp_count), keyed by
    SCRIPT_CLASSES name, plus 'letters' = all \\p{L} characters."""
    t = _c(text)
    out = {name: F.regexp_count(t, F.lit(f"[{java}]")) for name, java, _ in SCRIPT_CLASSES}
    out["letters"] = F.regexp_count(t, F.lit(r"\p{L}"))
    return out


def script_lang_scores(s: dict[str, Column]) -> dict[str, Column]:
    """Script counts → per-language scores for the script-branch argmax
    (see SCRIPT_LANGS comment for the ja/zh disambiguation rule)."""
    return {
        "ja": F.when(s["kana"] > 0, s["kana"] + s["han"]).otherwise(F.lit(0)),
        "zh": s["han"],
        "ko": s["hangul"],
        "ar": s["arabic"],
        "ru": s["cyrillic"],
        "el": s["greek"],
    }


def _let(value: Column, body) -> Column:
    """Bind ``value`` once and evaluate ``body(bound)`` — the SQL-expression
    analog of a ``let``: ``element_at(transform(array(v), x -> body(x)), 1)``.
    Higher-order-function lambda variables are evaluated exactly once at
    runtime, so a subexpression referenced N times inside ``body`` costs one
    evaluation instead of N copies of its subtree (guide §1.2 per-task work:
    neither GenerateExec nor interpreted projections do common-subexpression
    elimination, and optimizer predicate pushdown duplicates projected
    aliases into filters — a let-bound value is immune to both)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def lang_id(text) -> Column:
    """Heuristic language ID, two stages in one native expression:

    1. Script stage — when a strict majority of the text's letters belong
       to an unsegmented/non-Latin script (kana/Han/Hangul/Arabic/Cyrillic/
       Greek), classify by script-count argmax (zh/ja/ko/ar/ru/el); the
       majority gate keeps Latin text that merely quotes a few CJK
       characters out of this branch.
    2. Stopword stage — otherwise argmax of per-language stopword hit
       counts over STOPWORDS, 'und' (undetermined) when no stopwords hit.

    Both argmaxes tie-break deterministically by language code order.

    Evaluation shape (round-6 optimization; semantics unchanged and
    test-pinned against the previous per-language formulation): the text is
    lowered and tokenized ONCE, and per-language hit counts come from one
    fold over the tokens with a token → increment-vector literal map — the
    old form re-split the text per language per argmax copy (24 splits per
    evaluation, measured 31s of the 87s curate chain at sf0.1×16). The
    script gate needs only (total script chars, total letters): 2 regex
    scans instead of 7 (the per-script breakdown is evaluated only inside
    the rarely-taken script branch — Unicode scripts are disjoint, so one
    combined character class counts exactly the old per-class sum)."""
    t = _c(text)
    langs = sorted(STOPWORDS)
    # token -> per-language increment vector (a stopword may belong to
    # several languages: 11 of the 108 distinct words are shared)
    inc: dict[str, list[int]] = {}
    for i, lang in enumerate(langs):
        for w in STOPWORDS[lang]:
            inc.setdefault(w, [0] * len(langs))[i] = 1
    map_args: list[Column] = []
    for w in sorted(inc):
        map_args.append(F.lit(w))
        map_args.append(F.array(*[F.lit(v) for v in inc[w]]))
    hitmap = F.create_map(*map_args)
    zeros = F.array(*[F.lit(0)] * len(langs))
    counts = F.aggregate(
        _tokens(t),
        zeros,
        # miss-guard: most tokens are not stopwords — let-bind the single
        # map lookup and keep the accumulator unchanged on a miss instead
        # of zip_with-ing a zero vector (measured ~1.6x on the fold)
        lambda acc, tok: _let(
            F.try_element_at(hitmap, tok),
            lambda v: F.when(v.isNull(), acc).otherwise(
                F.zip_with(acc, v, lambda a, b: a + b)
            ),
        ),
    )

    def _stop_argmax(c: Column) -> Column:
        # 'und' sentinel: wins only the all-zero tie — every language entry
        # has negidx <= 0 < 1, so any positive hit count beats it, and ties
        # between languages resolve to the smallest index = smallest code
        # (langs are enumerated in sorted order), exactly the old
        # array_min(struct(neg_hits, lang)) tie-break.
        entries = [
            F.struct(
                F.element_at(c, i + 1).alias("hits"),
                F.lit(-i).alias("negidx"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ] + [
            F.struct(
                F.lit(0).alias("hits"), F.lit(1).alias("negidx"), F.lit("und").alias("lang")
            )
        ]
        return F.when(c.isNull(), F.lit("und")).otherwise(
            F.array_max(F.array(*entries))["lang"]
        )

    stop_lang = _let(counts, _stop_argmax)

    def _script_argmax(s: Column) -> Column:
        scores = {
            "ja": F.when(s["kana"] > 0, s["kana"] + s["han"]).otherwise(F.lit(0)),
            "zh": s["han"],
            "ko": s["hangul"],
            "ar": s["arabic"],
            "ru": s["cyrillic"],
            "el": s["greek"],
        }
        return F.array_min(
            F.array(
                *[
                    F.struct(
                        (-scores[code]).cast("long").alias("neg_hits"),
                        F.lit(code).alias("lang"),
                    )
                    for code in SCRIPT_LANGS
                ]
            )
        )["lang"]

    per_script = F.struct(
        *[
            F.regexp_count(t, F.lit(f"[{java}]")).alias(name)
            for name, java, _ in SCRIPT_CLASSES
        ]
    )
    script_lang = _let(per_script, _script_argmax)
    all_script_class = "".join(java for _, java, _ in SCRIPT_CLASSES)
    n_script = F.regexp_count(t, F.lit(f"[{all_script_class}]"))
    letters = F.regexp_count(t, F.lit(r"\p{L}"))
    # rlike pre-gate: AND short-circuits, so text with no script character
    # at all (the common case in Latin corpora) pays ONE regex scan instead
    # of two counting scans; with zero script chars the old gate
    # 0*2 > letters is false for every letters >= 0, so the branch taken is
    # identical (and a null text yields null either way -> 'und').
    has_script = t.rlike(f"[{all_script_class}]")
    return F.when(has_script & (n_script * 2 > letters), script_lang).otherwise(stop_lang)


def quality_score(text) -> Column:
    """Composite quality score in [0,1] from cheap surface statistics:
    length band, punctuation ratio, stopword ratio, mean word length —
    the C4/Gopher-style rule family as one native expression."""
    t = _c(text)
    # let-bind the four surface statistics once (see _let): the previous
    # flat form inlined ws_token_count (trim + split) into every CASE arm —
    # ~8 splits of the text per evaluation, doubled again when the optimizer
    # pushes a quality filter below the projection (measured 4.7s of the
    # curate chain at sf0.1×16; ~1s after this rewrite).
    stats = F.struct(
        F.length(t).alias("nc"),
        ws_token_count(t).alias("nt"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0)).alias("np"),
        stopword_hits(t, "en").alias("ns"),
    )

    def _score(s: Column) -> Column:
        n_chars, n_tokens, n_punct, n_stop = s["nc"], s["nt"], s["np"], s["ns"]
        punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
        stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
        mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
        len_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), 1.0).otherwise(0.25)
        punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
        stop_ok = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.6)
        wl_ok = F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), 1.0).otherwise(0.5)
        return 0.4 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wl_ok

    return _let(stats, _score).alias("quality")


def doc_fingerprint(text) -> Column:
    """Deterministic document fingerprint: sha2 over aggressively normalized
    text (lowercase, punctuation stripped, whitespace collapsed) — catches
    formatting-only duplicates that exact hashing misses."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(_c(text)), r"[^\p{L}\p{N}]+", " "), r"\s+", " ")
    )
    return F.sha2(norm, 256)


def _ws_tokens(text) -> Column:
    """Whitespace tokens with empties dropped (split on runs, trim first)."""
    return F.filter(F.split(F.trim(_c(text)), r"\s+"), lambda t: t != "")


def word_ngram_array(toks, n: int) -> Column:
    """Word n-grams of a token array; EMPTY for inputs shorter than ``n``.
    The guard matters: ``sequence(1, 0)`` in Spark is the DESCENDING
    ``[1, 0]`` (not empty), and ``slice(_, 0, n)`` throws — so short texts
    must short-circuit to an empty array, never reach the sequence."""
    n_ng = F.size(toks) - (n - 1)
    return F.when(
        n_ng >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_ng, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(text, n: int = 3) -> Column:
    """Intra-document repetition score: fraction of word n-grams that are
    duplicates of an earlier n-gram in the same document (the Gopher/
    MassiveText "fraction of duplicate n-grams" rule family, Rae et al.
    2021 §A1.1). One native expression — array ops only, no shuffle, no
    Python; runs inside the same scan as the other quality signals, so at
    100 TB it adds zero extra passes.

    Documents with fewer than ``n`` tokens score 0.0 (nothing to repeat).
    """
    # token array and n-gram array let-bound once (round-6; see _let)
    def _frac(toks: Column) -> Column:
        n_ng = F.size(toks) - (n - 1)
        distinct = F.size(F.array_distinct(word_ngram_array(toks, n)))
        return F.when(n_ng >= 1, (n_ng - distinct) / n_ng.cast("double")).otherwise(
            F.lit(0.0)
        )

    return _let(_ws_tokens(text), _frac).alias("dup_ngram_fraction")


def corpus_top_ngrams(docs, text_col: str = "text", by: str = "source",
                      n: int = 2, k: int = 5):
    """Per-group top-k word n-grams by document frequency-weighted count —
    the corpus-level boilerplate detector (a hot header/footer n-gram shows
    up with a count near the group's doc count). Plan at scale: explode →
    partial-aggregated groupBy (map-side combine keeps the shuffle at
    distinct-ngram cardinality, not token cardinality) → per-group window
    rank over the already-aggregated counts (tiny). Deterministic tie-break:
    count desc, then n-gram lexicographic."""
    from pyspark.sql import Window

    toks = _ws_tokens(F.col(text_col))
    ngrams = word_ngram_array(toks, n)
    counts = (
        docs.select(F.col(by).alias("grp"), F.explode(ngrams).alias("ngram"))
        .groupBy("grp", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("ngram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# URL/domain statistics — the C4/RefinedWeb URL-filtering primitive: corpus
# curation starts from per-domain frequencies (blocklists, per-domain caps).
# Same regex dialect in Java and RE2: no lookaround, no backrefs; (?i) works
# in both. The domain group is dot-SEPARATED labels (each label ends on an
# alphanumeric/hyphen), so sentence punctuation after a URL — 'example.com.'
# — never rides into the captured domain and splits the frequency key.
URL_DOMAIN_RE = r"(?i)https?://(?:www\.)?([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"


def extract_domains(text) -> Column:
    """Lowercased domains of every URL in the text (scheme and leading
    ``www.`` stripped) — one native regexp_extract_all, no Python."""
    return F.transform(
        F.regexp_extract_all(_c(text), F.lit(URL_DOMAIN_RE), 1),
        lambda d: F.lower(d),
    )


def domain_counts(docs, text_col: str = "text"):
    """Per-domain URL frequency across the corpus. Plan at scale: extract
    runs inside the document scan, explode, then one hash-aggregate —
    map-side combine keeps the shuffle at distinct-domain cardinality
    (millions), never URL-occurrence cardinality (trillions)."""
    return (
        docs.select(F.explode(extract_domains(F.col(text_col))).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# HTML→text rules, applied in order. Same Java/RE2 dialect subset as the
# rest of this module: inline (?is) flags and lazy quantifiers work in
# both; script and style get SEPARATE rules because a </\1> backreference
# would be Java-only (RE2 has none). Block-level tags become newlines so
# paragraph structure survives for the line-level filters (c4_line_filter,
# paragraph dedup); every other tag becomes a space.
HTML_STRIP_RULES = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)</?(?:p|br|div|h[1-6]|li|tr)\b[^>]*/?\s*>", "\n"),
    (r"<[^>]+>", " "),
]

# Entity decode pairs, in order — &amp; LAST so double-escaped text
# ("&amp;lt;") decodes one level per pass like a real parser's first step,
# never jumping straight to '<'.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(html) -> Column:
    """Basic HTML→text extraction — the first stage of every web-corpus
    pipeline (WET-style text stripping; C4 and CCNet both start from
    extracted text): drop script/style/comment blocks, turn block-level
    tags into newlines, strip remaining tags, decode the six ubiquitous
    entities, collapse whitespace (horizontal runs → one space, spaces
    trimmed around newlines, newline runs → one newline, ends trimmed).
    Deliberately rule-based and scan-local — one native regexp_replace
    chain, zero shuffles, zero Python — not a DOM parser: boilerplate
    removal beyond this (nav/footer pruning à la trafilatura) belongs to
    the line/paragraph filters downstream (c4_line_filter,
    strip_duplicate_paragraphs), which is exactly how the production
    pipelines layer it."""
    t = _c(html)
    for pat, rep in HTML_STRIP_RULES:
        t = F.regexp_replace(t, pat, rep)
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    # trim ALL whitespace at the ends (trim() strips spaces only, and a
    # leading block tag would otherwise leave a leading newline)
    return F.regexp_replace(t, r"^\s+|\s+$", "")


# Full-URL extraction (vs URL_DOMAIN_RE's domain group): everything from
# the scheme to the first whitespace/quote/angle — the token a crawler's
# link field or an inline mention carries.
URL_FULL_RE = r"(?i)https?://[^\s<>\"']+"


def extract_urls(text) -> Column:
    """Every full URL mentioned in the text — one native
    regexp_extract_all, the companion of :func:`extract_domains`."""
    return F.regexp_extract_all(_c(text), F.lit(URL_FULL_RE), 0)


def canonical_url(url) -> Column:
    """URL canonicalization for URL-level dedup — the FIRST dedup stage of
    web-corpus pipelines (CC-derived corpora dedup by normalized URL
    before any content pass): drop the fragment, drop the scheme,
    lowercase the host, strip a leading ``www.`` and an explicit default
    port, drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``),
    and trim trailing ``?``/``&``/``/``. The PATH keeps its case (paths
    are case-sensitive; hosts are not). Scan-local regexp chain, Java/RE2
    dialect subset like the rest of this module."""
    u = F.regexp_replace(_c(url), r"#.*$", "")
    u = F.regexp_replace(u, r"(?i)^https?://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[^/?#]+", "")
    # tracking params are matched WITH their leading separator (so
    # 'not_gclid=5' or a path segment containing 'gclid=' is never
    # clipped); '&'-led occurrences first, then a '?'-led first param
    # re-attaches the next param to '?' — fixed-string replacements only,
    # because Java ($1) and RE2 (\\1) disagree on backref syntax
    rest = F.regexp_replace(rest, r"(?i)&(?:utm_[a-z]+|gclid|fbclid)=[^&#]*", "")
    rest = F.regexp_replace(rest, r"(?i)\?(?:utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "?")
    rest = F.regexp_replace(rest, r"/+\?", "?")  # '/path/?q' ≡ '/path?q'
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(host, rest)


# PII scrub patterns, applied in order (email before phone so the digits in
# a mailbox name aren't half-masked first; card before phone so a 13-15
# digit card isn't half-masked as a phone number). Same regex dialect subset
# works in Java (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
# The <CC> entry is NOT a blind regexp_replace: candidates (13-19 digits
# with optional single space/dash separators) are verified with a native
# Luhn checksum and only valid card numbers are masked.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d(?:[ -]?\d){11,17}\d\b", "<CC>"),
    (r"\+?\b\d{9,15}\b", "<PHONE>"),
]


def luhn_valid(cand) -> Column:
    """Native Luhn checksum over the digits of ``cand`` (separators
    stripped): double every second digit from the right, subtract 9 when
    the doubled digit exceeds 9, valid iff the sum is a multiple of 10.
    Pure array expressions — usable inside higher-order lambdas."""
    digits = F.regexp_replace(_c(cand), r"[^0-9]", "")
    n = F.length(digits)
    chars = F.split(digits, "")

    def term(i):
        d = F.element_at(chars, i).cast("int")
        dd = d * 2
        dd9 = F.when(dd > 9, dd - 9).otherwise(dd)
        # 1-based pos from right = n - i + 1; double when it is even
        return F.when((n - i) % 2 == 1, dd9).otherwise(d)

    s = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + term(i))
    return (n > 0) & (s % 10 == 0)


def redact_pii(text) -> Column:
    """Training-data PII scrub: mask emails, IPv4 addresses, Luhn-valid
    payment-card numbers, and long digit runs (phone-like) with typed
    placeholder tokens — chained native expressions (one pass per pattern
    inside the same codegen stage; no Python, no shuffle). Pattern order is
    part of the spec: email first so mailbox digits don't get phone-masked,
    card before phone so card digits don't get phone-masked. Card masking
    is checksum-gated: candidates failing Luhn (order ids, random digit
    runs) are left for the later patterns or untouched."""
    out = _c(text)
    for pat, token in PII_PATTERNS:
        if token == "<CC>":
            # Candidates are the MAXIMAL matches of `pat`; each valid one is
            # replaced as a \b-anchored regex (candidates are digits, spaces,
            # and dashes only — no regex metachars to escape), so a valid
            # card that is a SUBSTRING of a longer unbroken digit run (an
            # order id) never corrupts it. The candidate list is sorted —
            # Spark's array_sort ≡ DuckDB's list_sort on ASCII — so the fold
            # order, and therefore the output on pathological overlaps, is
            # identical in both engines.
            cands = F.array_distinct(F.regexp_extract_all(out, F.lit(pat), 0))
            valid = F.array_sort(F.filter(cands, luhn_valid))
            out = F.aggregate(
                valid,
                out,
                lambda acc, c: F.regexp_replace(
                    acc, F.concat(F.lit(r"\b"), c, F.lit(r"\b")), F.lit(token)
                ),
            )
        else:
            out = F.regexp_replace(out, pat, token)
    return out


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...
# Gopher", Table A1) — the full document-level rule family as native
# expressions; quality_score above is the cheap composite, these are the
# individual pass/fail gates a curation pipeline filters or audits on.
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(text) -> Column:
    """struct of the Gopher document-quality gates, all computed in one
    scan-local expression (no UDF):

      word_count_ok     50 <= words <= 100000
      mean_word_len_ok  3 <= chars/word <= 10
      symbol_ratio_ok   '#' + '...' occurrences / words < 0.1
      bullet_lines_ok   < 90% of lines start with a bullet
      ellipsis_lines_ok < 30% of lines end with '...'
      alpha_word_ok     >= 80% of words contain an alphabetic char
      stopword_ok       >= 2 distinct common-English stopwords present
      pass              conjunction of all of the above
    """
    t = _c(text)
    # let-bind the word and line arrays once (round-6; see _let): the flat
    # form re-inlined the split+filter per flag that referenced them
    arrays = F.struct(
        F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "").alias("w"),
        F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != "").alias("l"),
    )

    def _flags(s: Column) -> Column:
        words, lines = s["w"], s["l"]
        n_words = F.size(words)
        n_chars = F.length(F.regexp_replace(t, r"\s+", ""))
        n_lines = F.size(lines)
        n_sym = F.regexp_count(t, F.lit(r"#|\.\.\.")).cast("double")
        n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])")))
        n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$")))
        n_alpha = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
        n_stop = F.size(
            F.array_intersect(
                F.array_distinct(F.transform(words, F.lower)),
                F.array(*[F.lit(w) for w in GOPHER_STOP]),
            )
        )
        nz_words = F.greatest(n_words, F.lit(1)).cast("double")
        nz_lines = F.greatest(n_lines, F.lit(1)).cast("double")
        flags = {
            "word_count_ok": (n_words >= 50) & (n_words <= 100_000),
            "mean_word_len_ok": (n_chars / nz_words >= 3) & (n_chars / nz_words <= 10),
            "symbol_ratio_ok": n_sym / nz_words < 0.1,
            "bullet_lines_ok": n_bullet / nz_lines < 0.9,
            "ellipsis_lines_ok": n_ellipsis / nz_lines < 0.3,
            "alpha_word_ok": n_alpha / nz_words >= 0.8,
            "stopword_ok": n_stop >= 2,
        }
        all_ok = None
        for c in flags.values():
            all_ok = c if all_ok is None else (all_ok & c)
        return F.struct(*[c.alias(k) for k, c in flags.items()], all_ok.alias("pass"))

    return _let(arrays, _flags)


def _top_sorted_run(sorted_arr):
    """(count, value) of the most frequent element of a SORTED array via
    one native fold — equal elements are adjacent, so the mode is the
    longest run. Strictly-greater updates keep the FIRST maximal run,
    i.e. the lexicographically smallest mode (mirrors SQL's
    row_number ORDER BY count DESC, value ASC). (0, NULL) for empty."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("best_v"),
    )

    def step(acc, x):
        run2 = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1).cast("long"))
        better = run2 > acc["best"]
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_v"]).alias("best_v"),
        )

    return F.aggregate(sorted_arr, init, step)


def gopher_repetition_flags(text) -> Column:
    """The REPETITION half of Gopher's rule family (Rae et al. 2021, Table
    A1's duplicate-line / duplicate-paragraph / top-n-gram filters), one
    scan-local struct of integer ppm fractions (exact integer division —
    no float compare drifts between engines):

      n_lines, dup_line_ppm        fraction of non-empty trimmed lines
                                   that repeat an earlier line
      dup_line_char_ppm            fraction of line characters inside the
                                   repeated occurrences
      n_paras, dup_para_ppm,       the same over \\n\\n-separated
      dup_para_char_ppm            paragraphs
      top2_ppm, top3_ppm, top4_ppm character fraction of the most
                                   frequent word 2/3/4-gram (count × gram
                                   length over normalized text length);
                                   ties → lexicographically smallest gram

    Gopher's thresholds (dup line ≥ 0.30, dup para ≥ 0.30, char variants
    ≥ 0.20, top-{2,3,4}-gram ≥ {0.20, 0.18, 0.16}) are left to the
    caller — these are audit numbers, not baked gates, matching how
    ``dup_ngram_fraction`` exposes the duplicate-n-gram rule.

    Everything is array folds over one row — zero shuffles, zero Python;
    the mode of each n-gram multiset comes from a sort + longest-run fold
    (:func:`_top_sorted_run`), not a groupBy."""
    t = _c(text)

    def _ppm(a, b):
        # floor(1e6·a / max(b,1)) as ONE double divide + floor, mirrored
        # verbatim in the oracle. Exact-portable here: 1e6·a < 2^53 is an
        # exact double, and a per-document quotient can only sit closer to
        # an integer than its ulp if it IS that integer (b ≤ ~1e6 keeps
        # non-integer quotients ≥ 1/b ≈ 1e-6 away, ulp ≈ 1e-10).
        return F.floor(
            (F.lit(1_000_000.0) * a.cast("double"))
            / F.greatest(b, F.lit(1)).cast("double")
        ).cast("long")

    def _dup_stats(parts):
        # let-bind the cleaned and distinct arrays (round-6): the flat form
        # recomputed the trim+filter chain once per statistic it fed
        def _stats(cleaned: Column) -> Column:
            def _with_distinct(dis: Column) -> Column:
                return F.struct(
                    F.size(cleaned).alias("n"),
                    F.size(dis).alias("nd"),
                    F.aggregate(
                        F.transform(cleaned, F.length),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    ).alias("chars"),
                    F.aggregate(
                        F.transform(dis, F.length),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    ).alias("dchars"),
                )

            return _let(F.array_distinct(cleaned), _with_distinct)

        return _let(F.filter(F.transform(parts, F.trim), lambda x: x != ""), _stats)

    # bind every shared intermediate ONCE: the line stats struct, the para
    # stats struct, and the token array (the flat round-5 form re-inlined
    # the token split into each top-n-gram computation and the dup splits
    # into each of their four statistics); the final struct is assembled
    # INSIDE the lambda so field accesses read the bound structs.
    bound = F.struct(
        _dup_stats(F.split(t, r"\n")).alias("ln"),
        _dup_stats(F.split(t, r"\n{2,}")).alias("pa"),
        _ws_tokens(F.lower(t)).alias("toks"),
    )

    def _assemble(s: Column) -> Column:
        ln, pa, toks = s["ln"], s["pa"], s["toks"]
        denom = F.length(F.array_join(toks, " "))

        def _top_ppm(n):
            # the sort+longest-run fold is let-bound too: reading both its
            # fields would otherwise run the whole fold twice
            return _let(
                _top_sorted_run(F.array_sort(word_ngram_array(toks, n))),
                lambda top: _ppm(
                    top["best"] * F.coalesce(F.length(top["best_v"]), F.lit(0)), denom
                ),
            )

        return F.struct(
            ln["n"].alias("n_lines"),
            _ppm(ln["n"] - ln["nd"], ln["n"]).alias("dup_line_ppm"),
            _ppm(ln["chars"] - ln["dchars"], ln["chars"]).alias("dup_line_char_ppm"),
            pa["n"].alias("n_paras"),
            _ppm(pa["n"] - pa["nd"], pa["n"]).alias("dup_para_ppm"),
            _ppm(pa["chars"] - pa["dchars"], pa["chars"]).alias("dup_para_char_ppm"),
            _top_ppm(2).alias("top2_ppm"),
            _top_ppm(3).alias("top3_ppm"),
            _top_ppm(4).alias("top4_ppm"),
        )

    return _let(bound, _assemble)


def char_trigrams(text) -> Column:
    """Character trigrams of whitespace-normalized, lowercased text (spaces
    collapsed to one, so word boundaries carry exactly one signal char).
    EMPTY array for texts shorter than 3 chars — the guard matters because
    ``sequence(1, 0)`` in Spark is the DESCENDING ``[1, 0]``, not empty."""
    norm = F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))
    n = F.length(norm)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: F.substring(norm, i, 3),
        ),
    ).otherwise(F.array().cast("array<string>"))


def seed_lm_familiarity(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_mod: int = 97,
):
    """CCNet-style LM quality signal (Wenzek et al., LREC 2020) re-shaped
    for a distributed engine: instead of shipping a pretrained KenLM, train
    a character-trigram model on an in-corpus SEED SPLIT (every doc whose
    id ≡ 0 mod ``seed_mod``) and score every document's trigrams against
    it. Returns one row per document with ≥ 1 trigram:

      n_tri         trigram count of the document
      seen_tri      trigrams that exist in the seed model
      hits          total seed-frequency mass of the doc's trigrams
      coverage_ppm  floor(1e6 * seen_tri / n_tri) — the filterable score

    Integer outputs only (the ratio uses ``floor`` over one IEEE-exact
    division, so it is bit-identical across engines — ``round`` half-way
    ties are not).

    Plan at scale: the model is a partial-aggregated groupBy over the seed
    split's trigrams (~1/seed_mod of the corpus; char-trigram vocabulary is
    bounded by charset³ — low-MB even at 100 TB) and is BROADCAST to the
    scoring join, so scoring is scan-local: explode → broadcast hash join →
    partial-aggregated groupBy(doc_id). The only full shuffle is on doc_id
    (uniform, AQE-splittable); no window, no Python.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"), char_trigrams(text_col).alias("_tg")
    )
    tri = d.select("doc_id", F.explode("_tg").alias("tg"))
    model = (
        tri.filter(F.pmod("doc_id", F.lit(seed_mod)) == 0)
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = tri.join(F.broadcast(model), "tg", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.count("c").alias("seen_tri"),
            F.sum(F.coalesce("c", F.lit(0))).alias("hits"),
        )
        .select(
            "doc_id",
            "n_tri",
            "seen_tri",
            "hits",
            F.floor(F.lit(1_000_000.0) * F.col("seen_tri") / F.col("n_tri"))
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


def seed_lm_logprob(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_mod: int = 97,
):
    """Add-one-smoothed character-trigram LM log-likelihood — the
    perplexity-filter form of the CCNet signal (Wenzek et al. 2020 filter
    by KenLM perplexity; :func:`seed_lm_familiarity` is the coverage
    proxy, this is the actual conditional log-probability):

      P(c₃ | c₁c₂) = (c3(tri) + 1) / (c2(prefix) + V)

    with c3 the seed-split trigram counts, c2 the prefix mass (sum of c3
    over trigrams sharing the 2-char prefix — the consistent conditional
    denominator), and V the seed alphabet size (distinct characters of
    the seed trigrams). Returns one row per document with ≥ 1 trigram:

      n_tri          trigram count
      logprob_micro  Σ floor(1e6·ln P) over the doc's trigram instances —
                     integer micronats, exact order-independent sums
                     (the DSIR libm-proofing)
      nll_micro      (0 − logprob_micro) div n_tri — average negative log
                     likelihood, the filterable perplexity proxy
                     (truncating division: Spark ``div`` ≡ DuckDB ``//``)

    Plan at scale: both model tables partial-aggregate the SEED split
    only (bounded by charset³ rows) and BROADCAST; V is one broadcast
    scalar; scoring is explode → two broadcast joins → one partial-
    aggregated groupBy(doc_id). No window, no Python. The ``greatest(…,
    1)`` in the denominator keeps the expression total when the corpus
    has no seed docs at all (everything scores the uniform floor).
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"), char_trigrams(text_col).alias("_tg")
    )
    tri = d.select("doc_id", F.explode("_tg").alias("tg"))
    m3 = (
        tri.filter(F.pmod("doc_id", F.lit(seed_mod)) == 0)
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    m2 = m3.groupBy(F.substring("tg", 1, 2).alias("bg")).agg(
        F.sum("c3").alias("c2")
    )
    v = m3.select(
        F.explode(
            F.array(
                F.substring("tg", 1, 1),
                F.substring("tg", 2, 1),
                F.substring("tg", 3, 1),
            )
        ).alias("ch")
    ).agg(F.count_distinct("ch").alias("v"))
    scored = (
        tri.join(F.broadcast(m3), "tg", "left")
        .withColumn("bg", F.substring("tg", 1, 2))
        .join(F.broadcast(m2), "bg", "left")
        .crossJoin(F.broadcast(v))
    )
    lam = F.floor(
        F.lit(1_000_000.0)
        * (
            F.log(F.coalesce("c3", F.lit(0)) + 1)
            - F.log(F.greatest(F.coalesce("c2", F.lit(0)) + F.col("v"), F.lit(1)))
        )
    ).cast("long")
    return (
        scored.select("doc_id", lam.alias("lam"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum("lam").alias("logprob_micro"),
        )
        .withColumn("nll_micro", F.expr("(0 - logprob_micro) div n_tri"))
    )


def lm_quality_buckets(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_mod: int = 97,
):
    """CCNet head/middle/tail partitioning (Wenzek et al., LREC 2020 §4.3):
    split the corpus into quality terciles by the LM familiarity score so a
    training run can sample the "head" harder — the published pipeline's
    perplexity buckets, re-based on ``seed_lm_familiarity``'s coverage_ppm
    (higher = more familiar = head). Returns one row per scored document:
    ``(doc_id, coverage_ppm, lm_bucket)`` with lm_bucket ∈ head/middle/tail.

    Tercile boundaries are DISCRETE (no interpolation — integer comparisons
    only, so Spark and any mirror engine agree bit-for-bit): with T1/T2 the
    smallest scores whose cumulative count reaches ceil(n/3) / ceil(2n/3),

      tail:   score <= T1,  middle: T1 < score <= T2,  head: score > T2

    Ties share a bucket (a value straddling a boundary goes entirely to the
    lower bucket), so bucket sizes are thirds only up to tie mass — the
    deterministic trade CCNet itself makes when it cuts on a score value.

    Plan at scale: the boundary computation runs on the score HISTOGRAM,
    not the corpus — coverage_ppm has at most 1e6+1 distinct values, so the
    ordered cumulative window sees a bounded (≤1e6-row) single partition no
    matter the input size, the same bounded-dimension exemption the IVF
    centroid step uses. The corpus itself takes one partial-aggregated
    groupBy (the histogram) plus one broadcast join of the 1-row threshold
    table; nothing collects to the driver.
    """
    from pyspark.sql import Window as W

    lm = seed_lm_familiarity(docs, id_col=id_col, text_col=text_col, seed_mod=seed_mod)
    hist = lm.groupBy(F.col("coverage_ppm").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    n = lm.agg(F.count(F.lit(1)).alias("n"))
    thr = (
        cum.crossJoin(n)
        .agg(
            # ceil(n/3) = floor((n+2)/3): n+2 ≤ 2^53 so the double division
            # floors exactly, and the same spelling is exact in DuckDB
            F.min(F.when(F.col("cum") >= F.floor((F.col("n") + 2) / 3).cast("long"), F.col("v"))).alias("t1"),
            F.min(F.when(F.col("cum") >= F.floor((2 * F.col("n") + 2) / 3).cast("long"), F.col("v"))).alias("t2"),
        )
    )
    return lm.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "coverage_ppm",
        F.when(F.col("coverage_ppm") <= F.col("t1"), F.lit("tail"))
        .when(F.col("coverage_ppm") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("lm_bucket"),
    )
