from pyspark.sql import functions as F

from anything2rdf_spark.functions import text as TX
from anything2rdf_spark.operators import schema_triples as ST


def test_engine_ontology(spark):
    t = ST.engine_ontology(spark)
    rows = t.collect()
    preds = {r["pred"] for r in rows}
    assert any(p.endswith("#type") for p in preds)
    labels = {r["obj_lit"] for r in rows if r["obj_lit"]}
    assert "word count" in labels and "Turn" in labels
    # every labeled thing also has a type declaration
    typed = {r["subj"] for r in rows if r["pred"].endswith("#type")}
    labeled = {r["subj"] for r in rows if r["obj_lit"]}
    assert labeled <= typed


def test_schema_triples_subclass(spark):
    t = ST.schema_triples(
        spark, classes={"http://x/A": "A", "http://x/B": "B"}, subclass_of={"http://x/B": "http://x/A"}
    )
    sub = [r for r in t.collect() if r["pred"].endswith("subClassOf")]
    assert len(sub) == 1 and sub[0]["subj"] == "http://x/B" and sub[0]["obj_iri"] == "http://x/A"


def test_parse_wiki_templates(spark):
    parse = TX.parse_wiki_templates_udf()
    df = spark.createDataFrame(
        [("pre {{Infobox person|name=Ada|born=1815}} mid {{cite|url=x{{inner|a=b}}}} post",), (None,)],
        "t string",
    )
    got = df.select(parse(F.col("t")).alias("v")).collect()
    fields = {(r["template"], r["key"], r["value"]) for r in got[0]["v"]}
    assert ("Infobox person", "name", "Ada") in fields
    assert ("Infobox person", "born", "1815") in fields
    assert got[1]["v"] == []
