"""Deterministic synthetic fixture generators (FIXTURES.md schemas).

Everything is generated *inside Spark* from ``spark.range`` + hash
expressions — no driver-side data, no RNG state — so the same (seed, size)
always yields byte-identical tables at any parallelism, and generation
scales to bench sizes (10^7+ turns) without collecting anything.

The transcripts table satisfies the FIXTURES.md §1 requirements: ≥200
conversations, lengths 1-50, one skewed conversation holding ≥10% of all
turns, empty/whitespace/multi-line texts, dictionary and non-dictionary
mentions, ``A, B and C``-style multi-mention lists (andcsv2rdf.scala:43-47),
and out-of-order rows (ordering must come from turn_idx, not input order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed surface-form dictionary used by both the transcripts generator and
# the entity dictionary — guarantees dictionary-matching mentions exist.
PERSON_NAMES = [
    "Ada Lovelace", "Charles Babbage", "Alan Turing", "Grace Hopper",
    "Edsger Dijkstra", "Barbara Liskov", "Donald Knuth", "John McCarthy",
    "Margaret Hamilton", "Tim Berners-Lee",
]
PLACE_NAMES = [
    "London", "Helsinki", "Paris", "Cambridge", "Turku", "Oxford",
    "Geneva", "Boston",
]
ORG_NAMES = ["Royal Society", "Bell Labs", "CERN", "MIT"]
# Names that appear in text but NOT in the dictionary (get-or-create path,
# EMLOCSV2RDF.scala:331).
UNKNOWN_NAMES = ["Zelda Fitzroy", "Quintus Ashby"]

ALL_MENTION_NAMES = PERSON_NAMES + PLACE_NAMES + ORG_NAMES + UNKNOWN_NAMES

FILLER_WORDS = [
    "the", "model", "ran", "a", "query", "over", "partitioned", "data",
    "and", "returned", "rows", "sorted", "by", "key", "with", "filter",
    "applied", "before", "join", "then", "wrote", "output", "to", "table",
    "while", "watching", "metrics", "for", "skew", "in", "shuffle",
]
TOOLS = ["search", "calculator", "browser", "sql", "python"]
ROLES = ["user", "assistant", "system", "tool"]


def _h(*cols, seed: int):
    return F.xxhash64(*cols, F.lit(seed))


def _pm(col, n: int):
    return F.pmod(col, F.lit(n))


def _text_expr(seed: int):
    """Deterministic per-turn text: 5-20 filler words, with injected
    dictionary mentions, multi-mention lists, multi-line and empty/blank
    variants — all as native exprs (scales to any row count)."""
    h = _h("conv_id", "turn_idx", seed=seed)
    n_words = (_pm(_h("conv_id", "turn_idx", seed=seed + 1), 16) + 5).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in FILLER_WORDS]),
            (_pm(_h("conv_id", "turn_idx", i, seed=seed + 2), len(FILLER_WORDS)) + 1).cast("int"),
        ),
    )
    base = F.array_join(words, " ")
    names = F.array(*[F.lit(n) for n in ALL_MENTION_NAMES])
    pick = lambda k: F.element_at(  # noqa: E731
        names, (_pm(_h("conv_id", "turn_idx", seed=seed + 10 + k), len(ALL_MENTION_NAMES)) + 1).cast("int")
    )
    mode = _pm(h, 13)
    with_mention = F.concat(base, F.lit(" "), pick(0), F.lit(" said so"))
    multi_mention = F.concat(
        base, F.lit(" per "), pick(0), F.lit(", "), pick(1), F.lit(" and "), pick(2)
    )
    multiline = F.concat(base, F.lit("\nnext line mentions "), pick(0))
    return (
        F.when(mode == 0, F.lit(""))            # empty text
        .when(mode == 1, F.lit("   "))           # whitespace-only
        .when(mode <= 4, with_mention)
        .when(mode == 5, multi_mention)          # "A, B and C" list
        .when(mode == 6, multiline)
        .otherwise(base)
    )


def _finish_turns(df: DataFrame, seed: int) -> DataFrame:
    h_role = _pm(_h("conv_id", "turn_idx", seed=seed + 3), 10)
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(_pm(F.col("turn_idx"), 2) == 1, F.lit("user"))
        .when(h_role == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    # a few null roles to exercise the admission predicate (OBCXML2RDF.scala:179)
    role = F.when(_pm(_h("conv_id", "turn_idx", seed=seed + 4), 53) == 0, F.lit(None)).otherwise(role)
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (_pm(_h("conv_id", "turn_idx", seed=seed + 5), len(TOOLS)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        mins=_pm(_h("conv_id", seed=seed + 6), 500000).cast("int") + F.col("turn_idx")
    )
    return df.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        _text_expr(seed).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    hot_frac: float = 0.10,
    max_len: int = 50,
    shuffle_rows: bool = True,
) -> DataFrame:
    """Synthesize the transcripts table (input_hint schema).

    Normal conversations get 1..max_len turns via a bounded ``sequence``
    explode; the single hot conversation (``conv_hot``) gets its turns from a
    separate ``spark.range`` so no partition ever materializes a giant array
    — the hot key is the skew-handling test subject (north_rule).
    """
    convs = spark.range(n_convs).select(
        F.concat(F.lit("conv_"), F.col("id").cast("string")).alias("conv_id"),
        (_pm(_h(F.col("id").cast("string"), seed=seed), max_len) + 1).alias("n_turns"),
    )
    normal = convs.select(
        "conv_id", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )
    # hot conv must hold >= hot_frac of ALL turns (FIXTURES.md §1 invariant
    # the skew tests rely on): derive from the ACTUAL normal count with a
    # ceiling — the old floor-of-expected-count gave 9.99% at best and less
    # when the hash-dependent realized count ran high
    import math

    n_normal = convs.agg(F.sum("n_turns")).collect()[0][0]
    hot_len = max(2, math.ceil(n_normal * hot_frac / (1.0 - hot_frac)))
    hot = spark.range(hot_len).select(
        F.lit("conv_hot").alias("conv_id"), F.col("id").cast("int").alias("turn_idx")
    )
    df = _finish_turns(normal.unionByName(hot), seed)
    if shuffle_rows:
        # deterministic scramble of row order: ordering semantics must come
        # from turn_idx, never from input order (FIXTURES.md §1)
        df = df.orderBy(_h("conv_id", "turn_idx", seed=seed + 7))
    return df


def entity_dictionary(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §2: dictionary with synonyms, a shared alt_label
    (ambiguity → first-match precedence), NFC/punct-variant labels, and rows
    matching no transcript mention."""
    rows = []
    for i, name in enumerate(PERSON_NAMES):
        alts = [name.split(" ")[-1]]
        rows.append((f"p{i:03d}", name, alts, "person", "en"))
    for i, name in enumerate(PLACE_NAMES):
        rows.append((f"l{i:03d}", name, [], "place", "en"))
    for i, name in enumerate(ORG_NAMES):
        rows.append((f"o{i:03d}", name, [], "org", "en"))
    # ambiguity: two entities share alt_label "The Society"
    rows.append(("o900", "Learned Society", ["The Society"], "org", "en"))
    rows.append(("o901", "Secret Society", ["The Society"], "org", "en"))
    # NFC test: decomposed é in label (matches composed "Études Institute")
    rows.append(("o902", "Études Institute", ["--Études--"], "org", "fr"))
    # unmatched dictionary row (appears in no transcript)
    rows.append(("x999", "Never Mentioned Anywhere", [], "concept", "en"))
    return spark.createDataFrame(
        rows, "entity_id string, pref_label string, alt_labels array<string>, kind string, lang string"
    )


def code_tables(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §4: role vocabulary incl. one uncertainty-suffixed code
    (ceectsv2rdf.scala:160-172) — transcripts also contain roles *absent*
    from the vocabulary (unknown-code warn path, SDFBCSV2RDF.scala:198)."""
    rows = [
        ("role", "user", "Human user", "en"),
        ("role", "assistant", "AI assistant", "en"),
        ("role", "system", "System prompt", "en"),
        ("role", "tool", "Tool output", "en"),
        ("role", "operator?", "Operator (uncertain)", "en"),
        ("tool", "search", "Web search", "en"),
        ("tool", "calculator", "Calculator", "en"),
        ("tool", "browser", "Browser", "en"),
        ("tool", "sql", "SQL runner", "en"),
        # note: tool code "python" is deliberately missing → unknown-code path
    ]
    return spark.createDataFrame(rows, "table string, code string, label string, lang string")


def alias_edges(spark: SparkSession, big_chain: int = 1000, seed: int = 42) -> DataFrame:
    """FIXTURES.md §3: union-find input — chain, diamond, self-loop, 2-cycle,
    a ``big_chain``-node component, isolated nodes."""
    small = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),          # chain
            ("d1", "d2"), ("d1", "d3"), ("d2", "d4"), ("d3", "d4"),  # diamond
            ("s1", "s1"),                                   # self-loop
            ("t1", "t2"), ("t2", "t1"),                    # 2-cycle
            ("iso1", "iso1"), ("iso2", "iso2"),            # isolated
        ],
        "src_id string, dst_id string",
    )
    big = spark.range(big_chain - 1).select(
        F.format_string("n%06d", F.col("id")).alias("src_id"),
        F.format_string("n%06d", F.col("id") + 1).alias("dst_id"),
    )
    return small.unionByName(big)


def relationships(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """FIXTURES.md §5: qualified edges over dictionary entity ids, incl. one
    dangling FK (quarantine path, EMLOCSV2RDF.scala:527)."""
    quals = ["BF", "AF", "BF/IN", "AF/IN", "IN", "CA"]
    base = spark.range(n).select(
        F.format_string("p%03d", _pm(_h(F.col("id").cast("string"), seed=seed), 10)).alias("left_id"),
        F.element_at(
            F.array(F.lit("knows"), F.lit("mentions"), F.lit("works with")),
            (_pm(_h(F.col("id").cast("string"), seed=seed + 1), 3) + 1).cast("int"),
        ).alias("rel_type"),
        F.format_string("l%03d", _pm(_h(F.col("id").cast("string"), seed=seed + 2), 8)).alias("right_id"),
        _pm(_h(F.col("id").cast("string"), seed=seed + 3), 101).cast("int").alias("confidence"),
        (F.lit(1700) + _pm(_h(F.col("id").cast("string"), seed=seed + 4), 100)).cast("string").alias("start_year"),
        (F.lit(1750) + _pm(_h(F.col("id").cast("string"), seed=seed + 5), 100)).cast("string").alias("end_year"),
        F.element_at(
            F.array(*[F.lit(q) for q in quals]),
            (_pm(_h(F.col("id").cast("string"), seed=seed + 6), len(quals)) + 1).cast("int"),
        ).alias("qualifier"),
    )
    dangling = spark.createDataFrame(
        [("zzz_missing", "knows", "p001", 80, "1700", "1710", "IN")],
        "left_id string, rel_type string, right_id string, confidence int, start_year string, end_year string, qualifier string",
    )
    return base.unionByName(dangling)
