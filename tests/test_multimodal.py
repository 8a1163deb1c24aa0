import pytest
from pyspark.sql import functions as F

from anything2rdf_spark.operators import multimodal as MM


def test_synth_media_and_feature_extraction(spark):
    media = MM.synth_media(spark, n=32)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] == 32 for r in rows)  # sha256 payload = 32 bytes
    # deterministic across partitioning
    feats2 = MM.extract_features(media.repartition(8))
    a = {(r["media_id"], tuple(r["feature"])) for r in rows}
    b = {(r["media_id"], tuple(r["feature"])) for r in feats2.collect()}
    assert a == b


def test_real_decode_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        MM.real_decode_stub(b"bytes", "image")


def test_frame_sample_plan(spark):
    media = MM.synth_media(spark, n=64)
    plan = MM.frame_sample_plan(media, every_ms=500)
    vids = media.filter(F.col("kind") == "video")
    assert plan.select("media_id").distinct().count() == vids.count()
    # every planned ts within duration
    joined = plan.join(vids.select("media_id", F.col("meta.duration_ms").alias("d")), "media_id")
    assert joined.filter(F.col("frame_ts_ms") > F.col("d")).count() == 0
