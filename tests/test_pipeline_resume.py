"""Pipeline end-to-end + idempotent-resume tests (SURVEY §5.2 item 3:
kill after stage k, re-run, byte-identical output)."""

import shutil

import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.plans.pipeline import Pipeline
from anything2rdf_spark.sources import synth


@pytest.fixture()
def inputs(spark):
    return {
        "transcripts": synth.transcripts(spark, n_convs=30, seed=21),
        "dictionary": synth.entity_dictionary(spark),
        "code_tables": synth.code_tables(spark),
        "alias_edges": synth.alias_edges(spark, big_chain=50),
        "dictionary_surfaces": synth.ALL_MENTION_NAMES,
    }


def _triple_set(df):
    return {
        (r["subj"], r["pred"], r["obj_iri"], r["obj_lit"], r["obj_lang"], r["obj_dtype"])
        for r in df.collect()
    }


def test_pipeline_end_to_end_and_resume(spark, tmp_path, inputs):
    wh = str(tmp_path / "wh")
    p = Pipeline(spark, wh, n_buckets=8)
    m1 = p.run(**inputs, fingerprint="fp1")
    assert all(m1[s]["status"] == "done" for s in ["normalize", "extract", "link", "canonicalize", "materialize"])
    t1 = _triple_set(p.triples())
    assert len(t1) > 0

    # full re-run: everything skips, output unchanged
    p2 = Pipeline(spark, wh, n_buckets=8)
    m2 = p2.run(**inputs, fingerprint="fp1")
    assert all(m2[s]["status"] == "skipped" for s in ["normalize", "extract", "link", "canonicalize", "materialize"])
    assert _triple_set(p2.triples()) == t1

    # kill-after-stage-k: wipe stages 4-5 outputs, resume recomputes only them
    shutil.rmtree(f"{wh}/canonical_map")
    shutil.rmtree(f"{wh}/triples")
    p3 = Pipeline(spark, wh, n_buckets=8)
    m3 = p3.run(**inputs, fingerprint="fp1")
    assert m3["normalize"]["status"] == "skipped"
    assert m3["extract"]["status"] == "skipped"
    assert m3["link"]["status"] == "skipped"
    assert m3["canonicalize"]["status"] == "done"
    assert m3["materialize"]["status"] == "done"
    assert _triple_set(p3.triples()) == t1  # byte-identical semantics

    # fingerprint change forces recompute
    m4 = Pipeline(spark, wh, n_buckets=8).run(**inputs, fingerprint="fp2")
    assert m4["normalize"]["status"] == "done"


def test_pipeline_canonicalization_rewrites_mentions(spark, tmp_path):
    """Alias edges between entity ids must rewrite mention triples to the
    canonical IRI and emit owl:sameAs."""
    ts = spark.createDataFrame(
        [("c1", 0, "user", "Ada Lovelace wrote notes", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    d = synth.entity_dictionary(spark)
    # p000 (Ada) asserted-same as p001: canonical = min(p000, p001) = p000
    edges = spark.createDataFrame([("p001", "p000")], "src_id string, dst_id string")
    p = Pipeline(spark, str(tmp_path / "wh2"), n_buckets=4)
    p.run(
        transcripts=ts, dictionary=d, alias_edges=edges,
        dictionary_surfaces=synth.ALL_MENTION_NAMES, fingerprint="x",
    )
    triples = p.triples()
    sameas = triples.filter(F.col("pred").contains("sameAs")).collect()
    assert len(sameas) == 1
    assert sameas[0]["subj"].endswith("entity_p000") and sameas[0]["obj_iri"].endswith("entity_p001")
    # dictionary triples for p001 were rewritten to p000
    assert triples.filter(F.col("subj").endswith("entity_p001")).count() == 0


def test_lineage_metrics_recorded(spark, tmp_path, inputs):
    wh = str(tmp_path / "wh3")
    p = Pipeline(spark, wh, n_buckets=4)
    p.run(**inputs, fingerprint="fp")
    rows = p.registry.metrics()
    stages = {r["stage"] for r in rows}
    assert stages == {"normalize", "extract", "link", "canonicalize", "materialize"}
    # per-partition rows present
    assert any(r["partition_id"] is not None for r in rows)
    # stage-level rows carry wall_ms and rows_out
    done = [r for r in rows if r["partition_id"] is None]
    assert all(r["wall_ms"] is not None and r["rows_out"] is not None for r in done)


def test_pipeline_non_default_ns(spark, tmp_path, inputs):
    """ADVICE r1: a Pipeline built with a non-default ns must mint EVERY
    entity IRI (turn/conversation/speaker/role/tool/entity/entity_new/
    sameAs) under that ns — mixed-namespace mints silently broke
    canonicalization's rewrite-map matching."""
    from anything2rdf_spark import NS as DEFAULT_NS
    from anything2rdf_spark import SCHEMA_NS

    other = "http://other.example/kg/"
    p = Pipeline(spark, str(tmp_path / "whns"), ns=other, n_buckets=4)
    p.run(**inputs, fingerprint="fpns")
    triples = p.triples()

    def leaked(col):
        # entity IRIs under the DEFAULT ns (SCHEMA_NS predicates/classes are
        # the engine ontology and stay put by design)
        return triples.filter(
            F.col(col).startswith(DEFAULT_NS) & ~F.col(col).startswith(SCHEMA_NS)
        ).count()

    assert leaked("subj") == 0
    assert leaked("obj_iri") == 0
    assert triples.filter(F.col("subj").startswith(other)).count() > 0
    # canonicalization actually rewrote mention targets into the custom ns
    from anything2rdf_spark.operators.extract import P_MENTIONS

    mentions = triples.filter(F.col("pred") == P_MENTIONS)
    assert mentions.count() > 0
    assert mentions.filter(~F.col("obj_iri").startswith(other)).count() == 0
