"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the end-to-end KG
pipeline on a deterministic bench corpus sized to the sf, and prints ONE JSON
line:

  {"metric": "triples_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The headline value is the BASELINE.json target metric — triples/sec end-to-end
(extract → triples → link → canonicalize → edges). The JVM is warmed up first
(codegen + broadcast machinery) so measurements reflect steady-state
throughput, which is what matters at cluster scale.

--scaling: runs the KG job in two fresh subprocesses at local[8] and
local[32] on the SAME corpus and reports throughput at both plus efficiency
= (rate@32) / (4 × rate@8) — the sandbox protocol for the north_rule's
N-vs-4N-executor criterion (BASELINE.md). Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "brand_revenue_broadcast",
    "sessionize_events",
    "top3_orders_per_customer",
    "cosine_topk",
    "semantic_search_docs",
    "exact_dedup_docs",
    "minhash_near_dup_docs",
]


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _bench_pages(sf: float) -> int:
    return max(500, int(200_000 * sf))


def make_spark(cpus: int):
    from docprocai_service_spark.session import get_spark

    return get_spark(
        app_name="bench", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def warmup(spark) -> None:
    """Touch codegen, broadcast, window, and the Arrow UDF path once."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).withColumn("k", F.pmod(F.col("id"), F.lit(100)))
    dim = spark.range(100).withColumnRenamed("id", "k")
    df.join(F.broadcast(dim), "k").groupBy("k").count().count()
    # force case-mapping class init outside the timed path (ICU or JVM)
    df.select(F.lower(F.concat(F.lit("WarmÜp"), F.col("id")))).count()
    from docprocai_service_spark.operators.extract import extract_text_udf

    s = spark.createDataFrame([(b"<main><p>warm up.</p></main>",)], "html binary")
    s.select(extract_text_udf("html")).count()


def run_kg(spark, n_pages: int) -> dict:
    from docprocai_service_spark.corpus import corpus_to_spark, make_corpus
    from docprocai_service_spark.plans.pipeline import run_pipeline

    corpus = make_corpus(n_pages=n_pages, n_entities=400, seed=42)
    pages, alias = corpus_to_spark(spark, corpus)
    pages = pages.localCheckpoint()  # corpus generation excluded from timing
    alias = alias.localCheckpoint()
    t0 = time.time()
    r = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    n_edges = r.edges.count()  # forces the full DAG
    n_triples = r.triples.count()
    wall = time.time() - t0
    return {
        "n_pages": n_pages,
        "n_triples": n_triples,
        "n_edges": n_edges,
        "kg_wall_s": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1),
        "pages_per_sec": round(n_pages / wall, 1),
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf = _sf_of(SF_DIR)
    spark = make_spark(CPUS)
    warmup(spark)
    queries = run_queries(spark, SF_DIR)
    kg = run_kg(spark, _bench_pages(sf))
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "triples_per_sec",
                "value": kg["triples_per_sec"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": CPUS,
                "kg": kg,
            }
        )
    )


def kg_only() -> None:
    """Subprocess entry for --scaling: KG throughput only, one JSON line."""
    sf = _sf_of(SF_DIR)
    spark = make_spark(CPUS)
    warmup(spark)
    kg = run_kg(spark, _bench_pages(sf))
    spark.stop()
    print(json.dumps({"cpus": CPUS, **kg}))


def scaling() -> None:
    """local[8] vs local[32] on identical input → BENCH/BASELINE.md."""
    results = {}
    for cpus in (8, 32):
        env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus), "SPARK_GRAFT_SF_DIR": SF_DIR}
        out = subprocess.run(
            [sys.executable, __file__, "--kg-only"], env=env, capture_output=True, text=True, check=True
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    r8, r32 = results[8], results[32]
    eff = r32["triples_per_sec"] / (4 * r8["triples_per_sec"])
    report = {
        "throughput_8_cores_triples_per_sec": r8["triples_per_sec"],
        "throughput_32_cores_triples_per_sec": r32["triples_per_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
        "n_pages": r8["n_pages"],
        "n_triples": r8["n_triples"],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism-level scaling run (sandbox protocol)\n\n"
            "Identical KG job (extract → triples → link → canonicalize → edges)\n"
            f"on the same deterministic corpus ({r8['n_pages']} pages, seed=42),\n"
            "run in fresh JVMs at local[8] and local[32] "
            "(the N vs 4N executor stand-in per BASELINE.md):\n\n"
            "| cores | triples/sec | pages/sec | wall (s) |\n|---|---|---|---|\n"
            f"| 8 | {r8['triples_per_sec']} | {r8['pages_per_sec']} | {r8['kg_wall_s']} |\n"
            f"| 32 | {r32['triples_per_sec']} | {r32['pages_per_sec']} | {r32['kg_wall_s']} |\n\n"
            f"**Scaling efficiency (8→32 cores)** = rate32 / (4 × rate8) = **{eff:.3f}**\n"
            f"(target ≥ 0.8 per BASELINE.json).\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--kg-only" in sys.argv:
        kg_only()
    else:
        main()
