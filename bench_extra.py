"""Extra benchmarks (guide §1.4): noop-sink isolation of each operator in
the driver-timed legs. NOT part of the frozen measurement contract —
bench.py stays the artifact of record; this file exists so optimization
claims in OPTIMIZATION_r06.md can cite per-operator numbers.

Usage (pin externally, e.g. `taskset -c 8-15 python bench_extra.py curate`):

    python bench_extra.py curate   # curate_corpus component breakdown
    python bench_extra.py emit     # extraction emit kernel variants
    python bench_extra.py scan     # mention scan kernel
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df, reps=2, action="noop"):
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        if action == "noop":
            noop(df)
        else:
            df.count()
        walls.append(round(time.time() - t0, 2))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"label": label, "walls_s": walls, "best_s": min(walls)}), flush=True)
    return min(walls)


def curate_docs(spark, rep=16):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    if rep > 1:
        docs = docs.select(
            F.explode(F.sequence(F.lit(1), F.lit(rep))).alias("_k"), "*"
        ).select(
            (F.col("doc_id") * rep + F.col("_k")).alias("doc_id"),
            F.concat("text", F.lit(" v"), F.col("_k").cast("string")).alias("text"),
        )
    return docs


def main_curate():
    from anything2rdf_spark.operators.curation import curate_corpus
    from anything2rdf_spark.operators.dedupe import normalized_text
    from anything2rdf_spark.operators.textstats import (
        lang_id,
        quality_score,
        redact_pii,
        ws_token_count,
    )
    from anything2rdf_spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="a2r-bx-curate", shuffle_partitions=4)
    docs = curate_docs(spark)
    # warm-up (JIT) on a slice, as bench.py does
    curate_corpus(docs.filter(F.pmod("doc_id", F.lit(50)) == 0), langs=("en",)).count()
    timed(spark, "base_scan", docs)
    timed(spark, "norm_hash_only", docs.select("doc_id", F.sha2(normalized_text("text"), 256).alias("h")))
    timed(spark, "lang_id_only", docs.select("doc_id", lang_id("text").alias("l")))
    timed(spark, "quality_only", docs.select("doc_id", F.round(quality_score("text"), 6).alias("q")))
    timed(spark, "ws_tokens_only", docs.select("doc_id", ws_token_count("text").alias("n")))
    timed(spark, "redact_pii_only", docs.select("doc_id", redact_pii("text").alias("c")))
    timed(spark, "full_chain_count", curate_corpus(docs, langs=("en",), min_quality=0.5), action="count")
    timed(spark, "full_chain_noop", curate_corpus(docs, langs=("en",), min_quality=0.5))
    spark.stop()


def bench_input(spark, replicate=12):
    path = os.path.join("/tmp", "a2r_bench_input_sf0.1")
    base = spark.read.parquet(path)
    if replicate > 1:
        ts = base.select(
            F.explode(F.sequence(F.lit(1), F.lit(replicate))).alias("_k"), "*"
        ).withColumn("conv_id", F.concat_ws("#", "conv_id", "_k")).drop("_k")
    else:
        ts = base
    return base, ts


def main_emit():
    from anything2rdf_spark.operators.extract import extract_triples
    from anything2rdf_spark.session import get_spark

    master = os.environ.get("BX_MASTER", "local[4]")
    n = int(master[master.find("[") + 1 : master.find("]")])
    rep = int(os.environ.get("BX_REPLICATE", "12"))
    spark = get_spark(master=master, app_name="a2r-bx-emit", shuffle_partitions=n)
    base, ts = bench_input(spark, replicate=rep)
    warm = base.filter(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(40)) == 0)
    extract_triples(warm).count()
    timed(spark, f"emit_count_{master}_rep{rep}", extract_triples(ts), action="count")
    timed(spark, f"emit_noop_{master}_rep{rep}", extract_triples(ts))
    spark.stop()


def main_scan():
    from anything2rdf_spark.operators.extract import extract_mentions
    from anything2rdf_spark.session import get_spark
    from anything2rdf_spark.sources import synth

    master = os.environ.get("BX_MASTER", "local[4]")
    n = int(master[master.find("[") + 1 : master.find("]")])
    rep = int(os.environ.get("BX_REPLICATE", "12"))
    spark = get_spark(master=master, app_name="a2r-bx-scan", shuffle_partitions=n)
    base, ts = bench_input(spark, replicate=rep)
    warm = base.filter(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(40)) == 0)
    extract_mentions(warm, synth.ALL_MENTION_NAMES).count()
    timed(spark, f"scan_count_{master}_rep{rep}", extract_mentions(ts, synth.ALL_MENTION_NAMES), action="count")
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "curate"
    {"curate": main_curate, "emit": main_emit, "scan": main_scan}[which]()
