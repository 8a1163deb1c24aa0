"""Straight-line pure-Python re-implementation of the reference conversion
semantics (SURVEY §5.2 item 1) — the *oracle* the Spark pipeline's triples
are P/R-scored against in tests. Per-row, no Spark, obviously correct;
mirrors OBCXML2RDF.scala:169-215 as re-keyed for transcripts.

NOT part of the pipeline; tests only.
"""

from __future__ import annotations

import re
from urllib.parse import quote_plus

from .. import NS, RDF_TYPE, SCHEMA_NS, XSD_DATETIME, XSD_INTEGER
from ..operators.extract import (
    C_CONVERSATION,
    C_ROLE,
    C_SPEAKER,
    C_TOOL,
    C_TURN,
    P_AT_TIME,
    P_FULLTEXT,
    P_HAS_SPEAKER,
    P_MENTIONS_SURFACE,
    P_PART_OF,
    P_ROLE,
    P_TURN_INDEX,
    P_USED_TOOL,
    P_WORDCOUNT,
)

Triple = tuple  # (subj, pred, obj_iri, obj_lit, obj_lang, obj_dtype)


def _enc(s) -> str:
    # Java URLEncoder.encode(s, "UTF-8") analog (Anything2RDF.scala:146)
    return quote_plus(str(s))


def mint(kind: str, *keys, ns: str = NS) -> str:
    return ns + kind + "".join("_" + _enc(k) for k in keys)


def wordcount(t: str) -> int:
    """Separator-count semantics (OBCXML2RDF.scala:210)."""
    return len(re.findall(r"\s+", t))


def mention_pattern(surfaces: list[str]) -> re.Pattern:
    ordered = sorted(set(surfaces), key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(re.escape(s) for s in ordered) + r")\b", re.IGNORECASE)


def convert_turn(
    conv_id: str,
    turn_idx: int,
    role: str | None,
    text: str | None,
    tool: str | None,
    ts,
    surfaces: list[str] | None = None,
    pattern: re.Pattern | None = None,
) -> set[Triple]:
    """One turn → expected triple set (admission + ANE guards included)."""
    if role is None or text is None:
        return set()
    t = mint("turn", conv_id, turn_idx)
    c = mint("conversation", conv_id)
    sp = mint("speaker", conv_id, role)
    r = mint("role", role)
    out: set[Triple] = {
        (t, RDF_TYPE, C_TURN, None, None, None),
        (t, P_PART_OF, c, None, None, None),
        (t, P_TURN_INDEX, None, str(turn_idx), None, XSD_INTEGER),
        (t, P_HAS_SPEAKER, sp, None, None, None),
        (sp, RDF_TYPE, C_SPEAKER, None, None, None),
        (sp, P_ROLE, r, None, None, None),
        (r, RDF_TYPE, C_ROLE, None, None, None),
        (c, RDF_TYPE, C_CONVERSATION, None, None, None),
    }
    if text.strip() != "":
        out.add((t, P_FULLTEXT, None, text, None, None))
        out.add((t, P_WORDCOUNT, None, str(wordcount(text)), None, XSD_INTEGER))
    if tool is not None and tool.strip() != "":
        out.add((t, P_USED_TOOL, mint("tool", tool), None, None, None))
        out.add((mint("tool", tool), RDF_TYPE, C_TOOL, None, None, None))
    if ts is not None:
        out.add((t, P_AT_TIME, None, ts.strftime("%Y-%m-%dT%H:%M:%S"), None, XSD_DATETIME))
    if surfaces:
        pat = pattern or mention_pattern(surfaces)
        canon = {s.lower(): s for s in surfaces}
        for m in set(pat.findall(text)):
            out.add((t, P_MENTIONS_SURFACE, None, canon[m.lower()], None, None))
    return out


def convert_all(rows, surfaces: list[str] | None = None) -> set[Triple]:
    """rows: iterable of (conv_id, turn_idx, role, text, tool, ts)."""
    pat = mention_pattern(surfaces) if surfaces else None
    out: set[Triple] = set()
    for conv_id, turn_idx, role, text, tool, ts in rows:
        out |= convert_turn(conv_id, turn_idx, role, text, tool, ts, surfaces, pat)
    return out


def precision_recall(got: set[Triple], expected: set[Triple]) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0)
    tp = len(got & expected)
    return (tp / len(got), tp / len(expected))
