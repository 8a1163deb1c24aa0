"""E2/E6/E7: schema (ontology) triple builders — the Spark analog of the
reference's driver-side EC/EOP/EDP declarations (Anything2RDF.scala:109-123;
P(uri, labels, class) at :94-99): a small driver-built list turned into a
triples DataFrame once per run and unioned into the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import (
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    SKOS_PREF_LABEL,
)
from ..schemas import TRIPLE_COLS

OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJECT_PROPERTY = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_DATATYPE_PROPERTY = "http://www.w3.org/2002/07/owl#DatatypeProperty"


def schema_triples(
    spark: SparkSession,
    classes: dict[str, str],
    object_props: dict[str, str] | None = None,
    datatype_props: dict[str, str] | None = None,
    subclass_of: dict[str, str] | None = None,
    lang: str = "en",
) -> DataFrame:
    """Build the static ontology relation.

    ``classes`` / ``object_props`` / ``datatype_props``: {iri: english label}
    (EC/EOP/EDP semantics: rdf:type + skos:prefLabel@en);
    ``subclass_of``: {child iri: parent iri} (E6 static hierarchy,
    EMLOCSV2RDF.scala:36-41).
    """
    rows: list[tuple] = []

    def decl(items: dict[str, str] | None, kind_iri: str):
        for iri, label in (items or {}).items():
            rows.append((iri, RDF_TYPE, kind_iri, None, None, None))
            if label:
                rows.append((iri, SKOS_PREF_LABEL, None, label, lang, None))

    decl(classes, OWL_CLASS)
    decl(object_props, OWL_OBJECT_PROPERTY)
    decl(datatype_props, OWL_DATATYPE_PROPERTY)
    for child, parent in (subclass_of or {}).items():
        rows.append((child, RDFS_SUBCLASSOF, parent, None, None, None))

    df = spark.createDataFrame(
        [(s, p, oi, ol, lg, dt, None, None) for s, p, oi, ol, lg, dt in rows],
        "subj string, pred string, obj_iri string, obj_lit string, obj_lang string,"
        " obj_dtype string, conv_id string, turn_idx int",
    )
    return df.select(*TRIPLE_COLS)


def engine_ontology(spark: SparkSession) -> DataFrame:
    """The transcript-KG ontology used by the extraction stage."""
    from .extract import (
        C_CONVERSATION,
        C_ROLE,
        C_SPEAKER,
        C_TOOL,
        C_TURN,
        P_AT_TIME,
        P_FULLTEXT,
        P_HAS_SPEAKER,
        P_MENTIONS,
        P_NEXT_TURN,
        P_PART_OF,
        P_ROLE,
        P_TURN_INDEX,
        P_USED_TOOL,
        P_WORDCOUNT,
    )

    return schema_triples(
        spark,
        classes={
            C_TURN: "Turn",
            C_CONVERSATION: "Conversation",
            C_SPEAKER: "Speaker",
            C_ROLE: "Role",
            C_TOOL: "Tool",
        },
        object_props={
            P_PART_OF: "part of conversation",
            P_HAS_SPEAKER: "has speaker",
            P_ROLE: "has role",
            P_USED_TOOL: "used tool",
            P_MENTIONS: "mentions",
            P_NEXT_TURN: "next turn",
        },
        datatype_props={
            P_TURN_INDEX: "turn index",
            P_FULLTEXT: "fulltext",
            P_WORDCOUNT: "word count",
            P_AT_TIME: "at time",
        },
    )
