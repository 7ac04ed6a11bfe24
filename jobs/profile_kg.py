"""Profiling harness for the scaling investigation: per-phase wall breakdown
of the bench-measured KG path at $SPARK_GRAFT_CPUS cores (pin with taskset).
Not part of the engine; a dev tool."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark, warmup, _bench_pages, _sf_of, SF_DIR, CPUS


def main() -> None:
    import tempfile

    from docprocai_service_spark import schemas
    from docprocai_service_spark.corpus import alias_dict_pdf, distributed_pages
    from docprocai_service_spark.plans.pipeline import run_pipeline

    n_pages = _bench_pages(_sf_of(SF_DIR))
    spark = make_spark(CPUS)
    t = {}
    t0 = time.time()
    warmup(spark)
    t["warmup"] = time.time() - t0

    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{n_pages}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_dir)
    alias = spark.createDataFrame(alias_dict_pdf(400), schema=schemas.ALIAS_DICT).localCheckpoint()
    pages = spark.read.parquet(corpus_dir)

    t0 = time.time()
    warm = run_pipeline(spark, pages.limit(max(200, n_pages // 50)), alias,
                        out_dir=None, collect_lineage=False)
    warm.edges.count()
    t["warm_pipeline"] = time.time() - t0

    t0 = time.time()
    r = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    t["run_pipeline_call"] = time.time() - t0  # includes any eager barriers
    t0 = time.time()
    n_edges = r.edges.count()
    t["edges_count"] = time.time() - t0
    t0 = time.time()
    n_linked = r.linked.count()
    t["linked_count"] = time.time() - t0
    stage_walls = {k: v for k, v in r.metrics.items() if k.endswith("_wall_ms")}
    total = t["run_pipeline_call"] + t["edges_count"] + t["linked_count"]
    print(json.dumps({
        "cpus": CPUS, "n_pages": n_pages, "n_triples": r.n_triples(),
        "n_edges": n_edges, "n_linked": n_linked,
        "measured_wall_s": round(total, 2),
        "triples_per_sec": round(r.n_triples() / total, 1),
        "phases_s": {k: round(v, 2) for k, v in t.items()},
        "stage_wall_ms": stage_walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
