"""SparkSession factory.

Replaces the reference's single worker thread + priority queue
(reference: service/DocProcAiService.py:694-707) with a properly configured
Spark runtime: all scale-out in this engine happens through partitioning,
not through that loop.

Defaults are tuned for the sandbox (local[N], single JVM) but every knob is
what you would set on a 1000-executor cluster too: AQE for runtime re-planning
and skew-join mitigation, Arrow for the pandas-UDF fast path, explicit shuffle
partition count instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docprocai_service_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or "*".
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cores) if str(cores).isdigit() else n

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1000, not 10000: with ~5KB html rows a 10k-row Arrow batch is ~50MB
        # resident per task on BOTH sides of the Python boundary — measured 2×
        # slower than 1k batches at 16 threads (cache locality + JVM/Python
        # pipelining at batch granularity). 1k rows ≈ 5MB batches.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.sql.session.timeZone", "UTC")
        # 12g, NOT bigger: on a huge heap (48g) G1 grows the young gen to tens
        # of GB and each young pause copies a massive survivor set — measured
        # 250ms pauses and a 2-5× end-to-end slowdown of the allocation-heavy
        # KG pipeline at 16 threads. A real cluster sizes executor heaps
        # 8-16g per 4-8 cores for exactly this reason.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark 4's ICU case mappings trigger CollationAwareUTF8String.<clinit>
        # on the first lower()/upper() inside a codegen'd stage — observed
        # 25-45s with all executor threads serialized on the class-init lock.
        # JVM case mapping is identical for the ASCII join keys used here.
        .config("spark.sql.icu.caseMappings.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
