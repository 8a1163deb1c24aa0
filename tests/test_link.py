from pyspark.sql import functions as F

from anything2rdf_spark import NS
from anything2rdf_spark.operators import extract as EX
from anything2rdf_spark.operators import link as LK
from anything2rdf_spark.sources import synth


def test_surface_index_precedence(spark):
    d = synth.entity_dictionary(spark)
    idx = {r["norm_surface"]: r["entity_id"] for r in LK.surface_index(d).collect()}
    # shared alt_label "The Society" → min entity_id of the two orgs (o900 < o901)
    assert idx["the society"] == "o900"
    # pref labels present, normalized
    assert idx["ada lovelace"] == "p000"
    # synonym (surname) registered
    assert idx["lovelace"] == "p000"
    # NFC variants: decomposed alt label normalizes to composed form
    assert idx["études institute"] == "o902"


def test_surface_index_is_unique(spark):
    d = synth.entity_dictionary(spark)
    idx = LK.surface_index(d)
    assert idx.count() == idx.select("norm_surface").distinct().count()


def test_link_matched_and_get_or_create(spark):
    d = synth.entity_dictionary(spark)
    m = spark.createDataFrame(
        [
            ("c1", 0, "Ada Lovelace", "ada lovelace"),
            ("c1", 1, "Zelda Fitzroy", "zelda fitzroy"),  # not in dictionary
            ("c2", 0, "Zelda Fitzroy", "zelda fitzroy"),  # same unknown again
        ],
        "conv_id string, turn_idx int, surface string, norm_surface string",
    )
    linked = LK.link_mentions(m, d)
    rows = {(r["conv_id"], r["turn_idx"]): (r["entity_iri"], r["matched"]) for r in linked.collect()}
    assert rows[("c1", 0)] == (NS + "entity_p000", True)
    # get-or-create: deterministic IRI, identical across rows/conversations
    assert rows[("c1", 1)][1] is False
    assert rows[("c1", 1)][0] == rows[("c2", 0)][0]
    assert rows[("c1", 1)][0].startswith(NS + "entity-new_")
    new = LK.new_entities(linked)
    assert new.count() == 1


def test_end_to_end_mention_linking(spark):
    ts = synth.transcripts(spark, n_convs=40, seed=11)
    d = synth.entity_dictionary(spark)
    mentions = EX.extract_mentions(ts, synth.ALL_MENTION_NAMES)
    linked = LK.link_mentions(mentions, d)
    n = linked.count()
    assert n > 0
    # dictionary names matched; UNKNOWN_NAMES took get-or-create
    unk = linked.filter(~F.col("matched"))
    assert set(r["surface"] for r in unk.select("surface").distinct().collect()) <= set(
        synth.UNKNOWN_NAMES
    )
    trip = LK.mention_triples(linked)
    assert trip.filter(F.col("obj_iri").isNull()).count() == 0


def test_dictionary_triples(spark):
    d = synth.entity_dictionary(spark)
    t = LK.dictionary_triples(d)
    rows = t.collect()
    pref = [r for r in rows if r["pred"].endswith("prefLabel")]
    assert all(r["obj_lang"] is not None for r in pref)
    alt = [r for r in rows if r["pred"].endswith("altLabel")]
    assert any(r["obj_lit"] == "The Society" for r in alt)
    types = [r for r in rows if r["pred"].endswith("#type")]
    assert any(r["obj_iri"].endswith("Person") for r in types)


def test_salt_join_equals_plain_join(spark):
    big = spark.range(2000).select(
        (F.col("id") % 5).cast("string").alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(str(i), f"lab{i}") for i in range(5)], "k string, label string"
    )
    plain = big.join(small, "k", "left").select("k", "v", "label")
    salted = LK.salt_join(big, small, "k", n_salts=8).select("k", "v", "label")
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0


def test_composite_key_link(spark):
    facts = spark.createDataFrame(
        [("w1", "a1", "en", 10), ("w1", "a2", "en", 20)],
        "work string, author string, lang string, v int",
    )
    dim = spark.createDataFrame(
        [("w1", "a1", "en", "W-1-A1")], "work string, author string, lang string, abstract string"
    )
    out = LK.composite_key_link(facts, dim, ["work", "author", "lang"], "abstract")
    got = {(r["author"]): r["abstract"] for r in out.collect()}
    assert got == {"a1": "W-1-A1", "a2": None}


def test_precedence_link(spark):
    facts = spark.createDataFrame([("u1",), ("u2",), ("u3",)], "uuid string")
    d1 = spark.createDataFrame([("u1", "MANIF")], "uuid string, v string")
    d2 = spark.createDataFrame([("u1", "IMG"), ("u2", "IMG")], "uuid string, v string")
    d3 = spark.createDataFrame([("u3", "RES")], "uuid string, v string")
    out = LK.precedence_link(facts, [(d1, "v"), (d2, "v"), (d3, "v")], "uuid")
    got = {r["uuid"]: r["resolved"] for r in out.collect()}
    assert got == {"u1": "MANIF", "u2": "IMG", "u3": "RES"}
