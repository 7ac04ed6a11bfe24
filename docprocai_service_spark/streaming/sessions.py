"""Streaming session windows — the Structured Streaming analog of the
reference's stateful ordered video segmentation
(reference: fileextractlib/VideoProcessor.py:92-174: iterate frames in time
order, start a new segment when similarity drops and the current segment is
long enough).

Batch form lives in __spark_entry__.sessionize_events (lag + cumsum window);
this module is the streaming form: watermarked event-time session_window with
a static gap. At scale the state store holds one open session per (user) key;
the watermark bounds state size by evicting sessions older than the lateness
allowance — the mechanism the reference lacks entirely (SURVEY §2.9:
"watermarks / late data / event-time windows: absent").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def session_stats_stream(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream over an events parquet directory → per-session aggregates."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_sessions_available_now(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
    gap: str = "30 minutes",
) -> None:
    """Drain the directory with trigger(availableNow) → parquet sink.

    Append output mode: a session row is emitted only once its window is
    closed by the watermark — exactly-once via the checkpoint + _spark_metadata
    sink log."""
    df = session_stats_stream(spark, input_dir, gap=gap)
    (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
