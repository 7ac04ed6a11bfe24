"""Streaming session windows: watermarked availableNow drain over events."""

from __future__ import annotations

from docprocai_service_spark.streaming.sessions import run_sessions_available_now


def test_streaming_sessions_match_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    events.write.mode("overwrite").parquet(in_dir)

    run_sessions_available_now(spark, in_dir, out_dir, ckpt, gap="30 minutes")
    got = spark.read.parquet(out_dir)

    # Batch reference: same session semantics via lag+cumsum
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = 1800
    batch = (
        events.withColumn(
            "new_sess",
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_s).cast("int"),
                F.lit(0),
            ),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"))
    )
    # watermark ("1 hour") closes every session in a drained static directory
    # except possibly each user's last one — compare session-count bounds.
    got_counts = {r["user_id"]: r["n"] for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    batch_counts = {r["user_id"]: r["n"] for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert set(got_counts) <= set(batch_counts)
    for u, n in got_counts.items():
        assert batch_counts[u] - 1 <= n <= batch_counts[u]
    # emitted sessions carry sane aggregates
    assert got.filter("n_events <= 0").count() == 0
