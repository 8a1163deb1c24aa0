"""Deterministic IRI-minting expression library.

Replaces the reference's minting DSL (Anything2RDF.scala:92-146) and its two
order-dependent counters (speechId OBCXML2RDF.scala:170; travel_+i
grandtourcsv2rdf.scala:120-125) with pure Column expressions over natural
keys — reproducible under any partitioning (SURVEY §1.4; never
``monotonically_increasing_id``).

All functions return :class:`pyspark.sql.Column` and run JVM-side inside
whole-stage codegen; nothing here touches Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import NS, SCHEMA_NS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def encode(c: Column | str) -> Column:
    """URL-encode a key for IRI safety (Anything2RDF.scala:146 ``encode``)."""
    return F.url_encode(_col(c))


def iri_fix(c: Column | str) -> Column:
    """Percent-escape characters illegal in IRIs (EMLOCSV2RDF.scala:118-136).

    The reference escapes a fixed set of 11 characters; we escape the same
    set with a single translate-free regexp chain (space, quotes, angle
    brackets, braces, pipe, backslash, caret, backtick).
    """
    out = _col(c)
    for ch, esc in [
        (" ", "%20"),
        ('"', "%22"),
        ("<", "%3C"),
        (">", "%3E"),
        ("\\{", "%7B"),
        ("\\}", "%7D"),
        ("\\|", "%7C"),
        ("\\\\", "%5C"),  # regex-escaped backslash
        ("\\^", "%5E"),
        ("`", "%60"),
        ("\\[", "%5B"),
        ("\\]", "%5D"),
    ]:
        out = F.regexp_replace(out, ch, esc)
    return out


def camel_case(c: Column | str) -> Column:
    """CamelCase a label for class IRIs (Anything2RDF.scala:79-84).

    Word characters are capitalized per word, separators dropped:
    ``"speech act"`` → ``"SpeechAct"``.
    """
    return F.regexp_replace(
        F.initcap(F.regexp_replace(_col(c), r"[^\p{L}\p{N}]+", " ")), " ", ""
    )


def property_camel_case(c: Column | str) -> Column:
    """camelCase with uncapitalized head, for property IRIs
    (Anything2RDF.scala:86-90): ``"speech act"`` → ``"speechAct"``."""
    cc = camel_case(c)
    return F.concat(F.lower(cc.substr(F.lit(1), F.lit(1))), cc.substr(F.lit(2), F.length(cc)))


def un_camel_case(c: Column | str) -> Column:
    """Insert spaces at lower→upper case boundaries (EMLOCSV2RDF.scala:104-107)."""
    return F.regexp_replace(_col(c), r"(?<=\p{Ll})(?=\p{Lu})", " ")


def valid_iri_or_fallback(candidate: Column | str, fallback: Column) -> Column:
    """F5: IRI validation with fallback — the Jena IRIFactory violation check
    (EMLOCSV2RDF.scala:159-168) as a structural regex: absolute scheme,
    no spaces/angle-brackets/quotes/controls. Invalid candidates fall back
    (reference warns + substitutes ``ns+id``); pair with a quarantine
    projection ``candidate.isNotNull() & !is_valid`` for the warn rows."""
    c = _col(candidate)
    # '//' optional: scheme-only absolute IRIs (urn:, mailto:, doi:) are
    # valid and accepted by the reference's IRIFactory check
    ok = c.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?[^\s<>\"{}|\\^`]+$")
    return F.when(c.isNotNull() & ok, c).otherwise(fallback)


def mint(kind: str, *keys: Column | str, ns: str = NS) -> Column:
    """Mint ``ns + kind + '_' + k1 + '_' + k2 ...`` from natural keys.

    The engine-wide identity rule: IRIs are pure functions of natural keys
    (``ns+"person_"+code`` FBTEETSV2RDF.scala:371; ``ns+"letter_"+encode(id)``
    ceectsv2rdf.scala:188). Keys are URL-encoded.
    """
    parts: list[Column] = [F.lit(ns + kind)]
    for k in keys:
        parts.append(F.lit("_"))
        parts.append(encode(_col(k).cast("string")))
    return F.concat(*parts)


def mint_hashed(kind: str, *keys: Column | str, ns: str = NS) -> Column:
    """Mint an IRI from the hash of a composite natural key — for keys too
    long or too sensitive to embed verbatim (time-span IRIs keyed on their own
    bounds, Anything2RDF.scala:33; reified-statement IRIs keyed on
    (s,p,o,qualifier), SURVEY §2.10 G3). sha2/256 is deterministic and
    collision-safe at 10^12 keys (xxhash64 is not: birthday bound ~2^32).

    NULL components are coalesced to a '\\x00' sentinel BEFORE concat_ws:
    concat_ws silently drops NULLs, so without the sentinel two keys that
    differ only in WHICH field is null (start=1771/end=NULL vs
    start=NULL/end=1771) would collapse to the same hash and merge
    contradictory qualifiers onto one statement. The sentinel keeps NULL
    distinct from '' and position-stable. DuckDB mirror:
    ``coalesce(CAST(x AS VARCHAR), chr(0))`` joined with ``chr(31)``."""
    key = F.concat_ws(
        "\x1f", *[F.coalesce(_col(k).cast("string"), F.lit("\x00")) for k in keys]
    )
    return F.concat(F.lit(ns + kind + "_"), F.sha2(key, 256).substr(1, 32))


def turn_iri(
    conv_id: Column | str = "conv_id", turn_idx: Column | str = "turn_idx", ns: str = NS
) -> Column:
    """Stable turn IRI keyed on (conv_id, turn_idx) — the BASELINE.json
    mandate replacing the reference's speechId counter (OBCXML2RDF.scala:170,
    191, 201)."""
    return mint("turn", conv_id, turn_idx, ns=ns)


def conv_iri(conv_id: Column | str = "conv_id", ns: str = NS) -> Column:
    return mint("conversation", conv_id, ns=ns)


def speaker_iri(
    conv_id: Column | str = "conv_id", role: Column | str = "role", ns: str = NS
) -> Column:
    """Speaker entity keyed on (conv_id, role) — the analog of
    ``speaker_<id>`` (OBCXML2RDF.scala:192) with the transcript's natural key."""
    return mint("speaker", conv_id, role, ns=ns)


def entity_iri(entity_id: Column | str = "entity_id", ns: str = NS) -> Column:
    return mint("entity", entity_id, ns=ns)


def schema_class_iri(label: Column | str) -> Column:
    """Class IRI from camelCased label (``EC``, Anything2RDF.scala:109-111)."""
    return F.concat(F.lit(SCHEMA_NS), camel_case(label))


def schema_prop_iri(label: Column | str) -> Column:
    """Property IRI from propertyCamelCased label (``EOP``/``EDP``,
    Anything2RDF.scala:113-123)."""
    return F.concat(F.lit(SCHEMA_NS), property_camel_case(label))


def bnode(*keys: Column | str) -> Column:
    """Deterministic blank-node label from natural keys (``BN()``,
    Anything2RDF.scala:121 — made reproducible)."""
    key = F.concat_ws("\x1f", *[_col(k).cast("string") for k in keys])
    return F.concat(F.lit("_:b"), F.sha2(key, 256).substr(1, 24))
