"""Benchmark harness: full KG pipeline at two parallelism levels.

Runs the staged pipeline (normalize → extract → link → canonicalize →
materialize) over deterministically synthesized transcripts sized to
$SPARK_GRAFT_SF_DIR's scale, at ``local[8]`` and ``local[$SPARK_GRAFT_CPUS]``
on the SAME materialized input — the sandbox stand-in for the N vs 4N
executor scaling requirement (BASELINE.md §3). Prints ONE JSON line.

Scaling efficiency = throughput_big / (ratio × throughput_small), where
throughput = final triples / pipeline wall seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anything2rdf_spark.plans.pipeline import Pipeline  # noqa: E402
from anything2rdf_spark.session import get_spark, stop_spark  # noqa: E402
from anything2rdf_spark.sources import synth  # noqa: E402

SF_CONVS = {"0.001": 100, "0.01": 1000, "0.1": 10000}


def sf_from_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.removeprefix("sf") if base.startswith("sf") else "0.1"


def materialize_input(sf: str, path: str) -> None:
    spark = get_spark(master="local[8]", app_name="a2r-bench-gen")
    n_convs = SF_CONVS.get(sf, 10000)
    ts = synth.transcripts(spark, n_convs=n_convs, seed=42)
    ts.repartition(32).write.mode("overwrite").parquet(path)
    stop_spark(spark)


def run_once(master: str, input_path: str, shuffle_partitions: int) -> dict:
    spark = get_spark(master=master, app_name="a2r-bench", shuffle_partitions=shuffle_partitions)
    wh = tempfile.mkdtemp(prefix="a2r_bench_wh_")
    try:
        transcripts = spark.read.parquet(input_path)
        dictionary = synth.entity_dictionary(spark)
        codes = synth.code_tables(spark)
        edges = synth.alias_edges(spark, big_chain=2000)
        pipe = Pipeline(spark, wh, n_buckets=32)
        t0 = time.time()
        metrics = pipe.run(
            transcripts=transcripts,
            dictionary=dictionary,
            code_tables=codes,
            alias_edges=edges,
            dictionary_surfaces=synth.ALL_MENTION_NAMES,
            fingerprint=f"bench-{master}",
            force=True,
        )
        wall = time.time() - t0
        n_triples = pipe.triples().count()
        stage_walls = {
            s: metrics[s]["wall_s"]
            for s in ["normalize", "extract", "link", "canonicalize", "materialize"]
        }
        return {
            "wall_s": wall,
            "n_triples": n_triples,
            "triples_per_sec": n_triples / wall,
            "stages": stage_walls,
        }
    finally:
        stop_spark(spark)
        shutil.rmtree(wh, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    input_path = os.path.join(tempfile.gettempdir(), f"a2r_bench_input_sf{sf}")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        materialize_input(sf, input_path)

    small = run_once("local[8]", input_path, shuffle_partitions=8)
    big = run_once(f"local[{cpus}]", input_path, shuffle_partitions=cpus)
    ratio = cpus / 8.0
    efficiency = big["triples_per_sec"] / (ratio * small["triples_per_sec"])

    queries = {f"stage_{k}": v for k, v in big["stages"].items()}
    queries["pipeline_local8"] = small["wall_s"]
    queries[f"pipeline_local{cpus}"] = big["wall_s"]

    result = {
        "metric": "kg_pipeline_wall",
        "value": round(big["wall_s"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(sf),
        "n_triples": big["n_triples"],
        "triples_per_sec_local8": round(small["triples_per_sec"], 1),
        f"triples_per_sec_local{cpus}": round(big["triples_per_sec"], 1),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling run (BASELINE.md §3 protocol)\n\n"
            f"Input: synthetic transcripts, sf={sf} "
            f"({SF_CONVS.get(sf, 10000)} conversations + skewed conv_hot, seed 42), "
            "same materialized parquet for both runs.\n\n"
            "| config | pipeline wall (s) | triples | triples/sec |\n"
            "| --- | --- | --- | --- |\n"
            f"| local[8] | {small['wall_s']:.2f} | {small['n_triples']} | {small['triples_per_sec']:.0f} |\n"
            f"| local[{cpus}] | {big['wall_s']:.2f} | {big['n_triples']} | {big['triples_per_sec']:.0f} |\n\n"
            f"**Scaling efficiency (8→{cpus} threads, ratio {ratio:g}×): "
            f"{efficiency:.3f}** (target ≥ 0.8 would equal perfect linear scaling; "
            "local-mode threads share one JVM/heap and one disk, so shuffle-bound "
            "stages cap below a real multi-executor cluster's headroom)\n\n"
            "Per-stage wall seconds (big run): "
            + ", ".join(f"{k}={v:.2f}" for k, v in big["stages"].items())
            + "\n"
        )


if __name__ == "__main__":
    main()
