"""Incremental ingest (capability C12) — the event-driven path, Spark-first.

The reference is event-driven but not a stream processor: Dapr pub/sub
messages carry only ids; work is queued and processed one-at-a-time with
at-least-once crash recovery (reference: controller/dapr_controller.py:14-44,
service/DocProcAiService.py:639-668). The correctness-bearing mechanism here
is the same one the batch pipeline uses — StageStore manifests + anti-join on
done (url, warc_ts) keys — so incremental ingest is just "run the DAG over
the keys that aren't done yet, append". Structured Streaming with
trigger(availableNow=True) is optional sugar over that batch semantics
(SURVEY.md §2.9).

Priority ordering (ingest < linking in the reference,
service/DocProcAiService.py:199,293) is the literal statement order below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..operators.extract import extract_stage
from ..operators.triples import mentions_stage, triples_stage
from ..sources.manifest import KEYS, StageStore


def incremental_ingest(
    spark: SparkSession,
    new_pages: DataFrame,
    store: StageStore,
) -> dict:
    """Process only not-yet-done (url, warc_ts) keys; append to stage outputs.

    At-least-once + idempotent: re-delivered pages anti-join away; a crash
    between stages re-runs from the last committed manifest (the reference's
    re-enqueue-PROCESSING sweep, without per-row state).
    """
    todo = store.todo_keys("extracted", new_pages) if store.is_done("extracted") else new_pages
    n_new = todo.count()
    if n_new == 0:
        return {"new_pages": 0}
    extracted = extract_stage(todo).localCheckpoint()
    # The 'extracted' stage is the re-delivery ledger (todo_keys above), so it
    # must commit LAST: a crash after committing it but before the downstream
    # appends would make retries see n_new==0 and silently never write those
    # pages' triples/mentions. Committing downstream first keeps at-least-once:
    # a crash anywhere re-runs the page, and each append_new anti-joins away
    # rows already present (page keys for triples, mention_id for mentions).
    triples = triples_stage(extracted).localCheckpoint()
    store.append_new("triples", triples, keys=KEYS)
    mentions = mentions_stage(triples)
    store.append_new("mentions", mentions, keys=["mention_id"])
    store.append_new("extracted", extracted, keys=KEYS)
    return {"new_pages": n_new, "new_triples": triples.count()}


def streaming_ingest(
    spark: SparkSession,
    input_dir: str,
    store: StageStore,
    checkpoint_dir: str,
) -> None:
    """Structured Streaming surface: watch a directory of web-page parquet,
    run the incremental DAG per micro-batch, stop when caught up
    (availableNow — the batch-friendly trigger; a live deployment would use
    a processingTime trigger instead)."""
    stream = spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_ingest(spark, batch_df, store)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
