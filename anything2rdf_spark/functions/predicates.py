"""Flag-driven predicate selection (SURVEY §2.3 P6/P7).

The reference picks an RDF predicate per row from a chain of boolean flags —
uncertainty-qualified relationship predicates (SDFBCSV2RDF.scala:206-219)
and event-type derivation (EMLOCSV2RDF.scala:203-214). Both are one
first-match-wins conditional chain, re-expressed as a single native
``when``-chain expression (JVM codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def predicate_choice(branches: list[tuple[Column, str]], default: str) -> Column:
    """First-match-wins predicate selection: ``branches`` is an ordered list
    of (condition, predicate) pairs; the first true condition's predicate
    wins, else ``default`` (the reference's if/else-if chain semantics —
    order matters, e.g. "certain" must be tested before the bare predicate).

    Returns a string column; compose with ``F.concat(F.lit(ns), ...)`` when
    the predicate is a full IRI.
    """
    if not branches:
        return F.lit(default)
    expr = F.when(branches[0][0], F.lit(branches[0][1]))
    for cond, pred in branches[1:]:
        expr = expr.when(cond, F.lit(pred))
    return expr.otherwise(F.lit(default))
