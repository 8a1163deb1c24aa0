"""Qualified-edge reification (SURVEY §2.10 G3) and relationship conversion
(FBTEETSV2RDF.scala:538-545; SDFBCSV2RDF.scala:231-237, 355-367;
EMLOCSV2RDF.scala:546-550).

A qualified edge (left —rel→ right with confidence / time-span qualifiers)
becomes: the plain edge triple + an ``rdf:Statement`` resource carrying
subject/predicate/object plus qualifier triples. The statement IRI is a hash
of (s, p, o) — the deterministic replacement for the reference's blank nodes
(FBTEETSV2RDF.scala:538 ``BN()``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import (
    NS,
    RDF_OBJECT,
    RDF_PREDICATE,
    RDF_STATEMENT,
    RDF_SUBJECT,
    RDF_TYPE,
    SCHEMA_NS,
    XSD_DATETIME,
    XSD_INTEGER,
)
from .. import iri
from ..functions import dates as DT
from ..schemas import TRIPLE_COLS
from .extract import _t

P_CONFIDENCE = SCHEMA_NS + "confidence"
P_CERTAINTY = SCHEMA_NS + "descriptiveCertainty"

# time-span vocabulary table: 'engine' keeps the engine-local terms; 'cidoc'
# emits the reference's real CIDOC-CRM IRIs (CIDOC.scala:61,101,233-236)
from .. import (  # noqa: E402
    CIDOC_BOB,
    CIDOC_BOE,
    CIDOC_EOB,
    CIDOC_EOE,
    CIDOC_HAS_TIMESPAN,
    CIDOC_TIMESPAN,
)

TIMESPAN_VOCAB = {
    "engine": {
        "has_timespan": SCHEMA_NS + "hasTimeSpan",
        "timespan_class": SCHEMA_NS + "TimeSpan",
        "bob": SCHEMA_NS + "beginOfTheBegin",
        "eob": SCHEMA_NS + "endOfTheBegin",
        "boe": SCHEMA_NS + "beginOfTheEnd",
        "eoe": SCHEMA_NS + "endOfTheEnd",
    },
    "cidoc": {
        "has_timespan": CIDOC_HAS_TIMESPAN,
        "timespan_class": CIDOC_TIMESPAN,
        "bob": CIDOC_BOB,
        "eob": CIDOC_EOB,
        "boe": CIDOC_BOE,
        "eoe": CIDOC_EOE,
    },
}

# engine-local aliases kept for importers
P_TIMESPAN = TIMESPAN_VOCAB["engine"]["has_timespan"]
P_BOB = TIMESPAN_VOCAB["engine"]["bob"]
P_EOB = TIMESPAN_VOCAB["engine"]["eob"]
P_BOE = TIMESPAN_VOCAB["engine"]["boe"]
P_EOE = TIMESPAN_VOCAB["engine"]["eoe"]
C_TIMESPAN = TIMESPAN_VOCAB["engine"]["timespan_class"]


def relationship_triples(
    rels: DataFrame,
    dictionary: DataFrame | None = None,
    ns: str = NS,
    vocab: str = "engine",
) -> tuple[DataFrame, DataFrame]:
    """Relationships → (triples, quarantine).

    When a dictionary is given, FKs are validated; rows whose left_id misses
    the dictionary are quarantined, not dropped silently (J8 anti-join guard,
    EMLOCSV2RDF.scala:527,539-545).

    Emits per valid row: the plain edge, the reified statement (type/
    subject/predicate/object), confidence (xsd:integer) + descriptive
    certainty bucket (SDFBCSV2RDF.scala:169-174,353-366), and a 4-point
    time-span from the qualifier semantics (SDFBCSV2RDF.scala:53-78).

    ``vocab='cidoc'`` emits the time-span under the reference's real
    CIDOC-CRM IRIs (P4_has_time-span / E52_Time-Span / P82a / P81a / P81b /
    P82b, CIDOC.scala:61,101,233-236) instead of the engine-local terms.
    """
    V = TIMESPAN_VOCAB[vocab]
    if dictionary is not None:
        dict_ids = F.broadcast(dictionary.select(F.col("entity_id").alias("left_id")))
        valid = rels.join(dict_ids, "left_id", "left_semi")
        quarantine = rels.join(dict_ids, "left_id", "left_anti")
    else:
        valid = rels
        quarantine = rels.limit(0)

    s = iri.mint("entity", "left_id", ns=ns)
    o = iri.mint("entity", "right_id", ns=ns)
    p = iri.schema_prop_iri("rel_type")
    # statement IRI keyed on (s, p, o, qualifiers) — (s,p,o) alone would
    # conflate two rows asserting the same edge with DIFFERENT confidence
    # or time qualifiers onto one rdf:Statement, merging contradictory
    # qualifier values (the reference mints a fresh BN per row)
    stmt = iri.mint_hashed(
        "stmt", s, p, o,
        F.col("confidence"), F.col("qualifier"),
        F.col("start_year"), F.col("end_year"),
        ns=ns,
    )

    start = DT.qualifier_bounds("qualifier", "start_year")
    end = DT.qualifier_bounds("qualifier", "end_year", end=True)
    bob, eob = start["bob"], start["eob"]
    boe, eoe = end["boe"], end["eoe"]
    ts_iri = DT.time_span_iri(bob, eob, boe, eoe, ns)
    has_span = bob.isNotNull() | eob.isNotNull() | boe.isNotNull() | eoe.isNotNull()

    rules = [
        _t(stmt, RDF_TYPE, obj_iri=F.lit(RDF_STATEMENT)),
        _t(stmt, RDF_SUBJECT, obj_iri=s),
        _t(stmt, RDF_OBJECT, obj_iri=o),
        _t(
            stmt,
            P_CONFIDENCE,
            obj_lit=F.col("confidence"),
            dtype=XSD_INTEGER,
            guard=F.col("confidence").isNotNull(),
        ),
        _t(
            stmt,
            P_CERTAINTY,
            obj_lit=DT.certainty_bucket("confidence"),
            # bucket '' (confidence 100) means "omit the qualifier" in the
            # reference, not "emit an empty literal"
            guard=F.col("confidence").isNotNull()
            & DT.certainty_bucket("confidence").isNotNull()
            & (DT.certainty_bucket("confidence") != ""),
        ),
        _t(stmt, V["has_timespan"], obj_iri=ts_iri, guard=has_span),
        _t(ts_iri, RDF_TYPE, obj_iri=F.lit(V["timespan_class"]), guard=has_span),
        _t(ts_iri, V["bob"], obj_lit=bob, dtype=XSD_DATETIME, guard=bob.isNotNull()),
        _t(ts_iri, V["eob"], obj_lit=eob, dtype=XSD_DATETIME, guard=eob.isNotNull()),
        _t(ts_iri, V["boe"], obj_lit=boe, dtype=XSD_DATETIME, guard=boe.isNotNull()),
        _t(ts_iri, V["eoe"], obj_lit=eoe, dtype=XSD_DATETIME, guard=eoe.isNotNull()),
    ]
    # the plain edge + rdf:predicate need the *dynamic* predicate IRI (a
    # column), which _t's static pred can't carry → emit those two directly.
    dyn = valid.select(
        F.explode(
            F.array(
                F.struct(
                    s.alias("subj"), p.alias("pred"), o.alias("obj_iri"),
                    F.lit(None).cast("string").alias("obj_lit"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(None).cast("string").alias("obj_dtype"),
                ),
                F.struct(
                    stmt.alias("subj"), F.lit(RDF_PREDICATE).alias("pred"), p.alias("obj_iri"),
                    F.lit(None).cast("string").alias("obj_lit"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(None).cast("string").alias("obj_dtype"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    stat = (
        valid.select(F.explode(F.array(*rules)).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("r.*")
    )
    out = dyn.unionByName(stat).select(
        "subj", "pred", "obj_iri", "obj_lit", "obj_lang", "obj_dtype",
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )
    return out.select(*TRIPLE_COLS), quarantine


def inverse_property_triples(pairs: DataFrame, ns: str = NS) -> DataFrame:
    """E7: mint property + inverse with owl:inverseOf both ways
    (EMLOCSV2RDF.scala:440-446). Input: (prop_label, inverse_label)."""
    from .. import OWL_INVERSEOF

    p1 = iri.schema_prop_iri("prop_label")
    p2 = iri.schema_prop_iri("inverse_label")
    fwd = pairs.select(
        p1.alias("subj"), F.lit(OWL_INVERSEOF).alias("pred"), p2.alias("obj_iri")
    )
    bwd = pairs.select(
        p2.alias("subj"), F.lit(OWL_INVERSEOF).alias("pred"), p1.alias("obj_iri")
    )
    return (
        fwd.unionByName(bwd)
        .select(
            "subj", "pred", "obj_iri",
            F.lit(None).cast("string").alias("obj_lit"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
        )
        .select(*TRIPLE_COLS)
    )
