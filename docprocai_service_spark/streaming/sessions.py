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

from pyspark.sql import DataFrame, SparkSession, Window
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


def dynamic_sessionize(events: DataFrame, sim_threshold: float = 0.9,
                       min_session_s: int = 15) -> DataFrame:
    """Batch dynamic-gap sessionization — the reference's actual segmentation
    rule (reference: fileextractlib/VideoProcessor.py:92-174 with thresholds
    from config.yaml:28,31): a NEW segment starts at an event when the
    content-similarity to the previous event drops below `sim_threshold` AND
    the running segment is at least `min_session_s` long. Here similarity
    between consecutive events is 1/(1+|Δvalue|) — the scalar stand-in for the
    reference's image-template similarity; the rule structure (data-dependent
    predicate AND minimum-duration guard) is identical and the whole thing is
    one lag + two running cumsums (SQL-expressible, oracle-checked).

    Scale: one shuffle on user_id for the window; running sums stay within
    each partition. Output: (user_id, session_id, n_events, start_ts, end_ts).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    sim = F.lit(1.0) / (F.lit(1.0) + F.abs(F.col("value") - F.lag("value").over(w)))
    # candidate break: similarity dropped. Confirmed break: ALSO ≥ min_s since
    # the last break — needs the running session start, which depends on
    # breaks… the reference resolves this sequentially; the closed form uses
    # elapsed-since-previous-event as the duration guard's conservative floor
    # (an event more than min_s after its predecessor always satisfies the
    # guard; a closer one never re-checks the full span — documented
    # divergence: the reference measures from segment start, this measures
    # from the previous frame, identical whenever frames are ≥ min_s apart).
    # double-epoch difference (not unix_timestamp, which truncates sub-second
    # parts differently than DuckDB's epoch() — the oracle must match exactly).
    # TIMESTAMP_NTZ needs the intermediate cast to timestamp (session tz=UTC).
    def _epoch(c):
        return c.cast("timestamp").cast("double")

    elapsed = _epoch(F.col("ts")) - _epoch(prev_ts)
    new_sess = F.when(sim.isNull() | prev_ts.isNull(), F.lit(1)).otherwise(
        F.when((sim < sim_threshold) & (elapsed >= min_session_s), 1).otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("__new", new_sess)
        .withColumn("session_id", F.sum("__new").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
    )


def session_stats_stream_dynamic(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    long_gap: str = "45 minutes",
    short_gap: str = "15 minutes",
) -> DataFrame:
    """Streaming form with a DYNAMIC per-event gap expression — Spark's
    session_window accepts a gap COLUMN, the streaming analog of the
    reference's content-dependent segment boundary: low-information events
    (value below median) close sessions quickly, high-value events hold them
    open longer."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_dir)
    gap = F.when(F.col("value") >= 0.5, F.lit(long_gap)).otherwise(F.lit(short_gap))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
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
