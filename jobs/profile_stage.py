"""Micro-profiler: time individual KG stages at $SPARK_GRAFT_CPUS (dev tool)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, _bench_pages, _sf_of, make_spark, warmup


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from docprocai_service_spark.corpus import distributed_pages
    from docprocai_service_spark.operators.extract import extract_stage
    from docprocai_service_spark.operators.triples import triples_stage

    n_pages = _bench_pages(_sf_of(SF_DIR))
    spark = make_spark(CPUS)
    t = {}
    t0 = time.time()
    warmup(spark)
    t["warmup"] = round(time.time() - t0, 2)

    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{n_pages}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        distributed_pages(spark, n_pages).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    def timed(name, df, action="count"):
        t0 = time.time()
        if action == "count":
            df.count()
        else:
            df.localCheckpoint().count()
        t[name] = round(time.time() - t0, 2)

    timed("scan_only", pages.select(F.length("html").alias("n")).groupBy().sum("n"))
    ext = extract_stage(pages)
    timed("extract_count", ext.select(F.length("text").alias("n")).groupBy().sum("n"))
    timed("extract_count2", ext.select(F.length("text").alias("n")).groupBy().sum("n"))
    tri = triples_stage(extract_stage(pages))
    timed("triples_count", tri)
    timed("triples_count2", tri)
    timed("triples_localckpt", tri, action="ckpt")
    print(json.dumps({"cpus": CPUS, "n_pages": n_pages, **t}))
    spark.stop()


if __name__ == "__main__":
    main()
