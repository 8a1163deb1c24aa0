"""anything2rdf_spark — a from-scratch PySpark-native knowledge-graph
construction engine over multi-turn conversation/agent transcripts.

Re-expresses the conversion semantics of jiemakel/anything2rdf (reference at
/root/reference, Scala/Jena batch converters) as a staged DataFrame pipeline:

    normalize -> extract -> link -> canonicalize -> materialize

The universal relation is the *triples DataFrame* (see `schemas.TRIPLE_SCHEMA`)
— the Spark analog of the reference's shared Jena Model
(Anything2RDF.scala:18), with `dropDuplicates` standing in for the model's
set semantics (Anything2RDF.scala:126-144) and deterministic natural-key IRIs
standing in for its mutable counters (OBCXML2RDF.scala:170).
"""

__version__ = "0.1.0"

NS = "http://example.org/a2r/"
SCHEMA_NS = NS + "schema#"

# Well-known vocabulary IRIs (public standards).
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_STATEMENT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement"
RDF_SUBJECT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#subject"
RDF_PREDICATE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate"
RDF_OBJECT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#object"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
SKOS_PREF_LABEL = "http://www.w3.org/2004/02/skos/core#prefLabel"
SKOS_ALT_LABEL = "http://www.w3.org/2004/02/skos/core#altLabel"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
OWL_INVERSEOF = "http://www.w3.org/2002/07/owl#inverseOf"
# CIDOC-CRM time-span vocabulary (public standard; the reference's 4-point
# time-span properties, CIDOC.scala:9,61,101,233-236)
CIDOC_NS = "http://www.cidoc-crm.org/cidoc-crm/"
CIDOC_TIMESPAN = CIDOC_NS + "E52_Time-Span"
CIDOC_HAS_TIMESPAN = CIDOC_NS + "P4_has_time-span"
CIDOC_BOB = CIDOC_NS + "P82a_begin_of_the_begin"
CIDOC_EOB = CIDOC_NS + "P81a_end_of_the_begin"
CIDOC_BOE = CIDOC_NS + "P81b_begin_of_the_end"
CIDOC_EOE = CIDOC_NS + "P82b_end_of_the_end"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATETIME = XSD + "dateTime"
