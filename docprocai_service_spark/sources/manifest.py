"""Checkpoint-resumable stage store (capabilities C9/C10).

Reproduces the reference's ingestion state machine — ENQUEUED→PROCESSING→DONE
rows with crash-recovery sweeps (reference:
persistence/IngestionStateDbConnector.py:48-112,
service/DocProcAiService.py:639-668) — without per-row state:

  * "DONE"   = the stage's output directory contains Spark's _SUCCESS marker
               (committed atomically by the output committer) plus a
               manifest.json with row counts. A torn write has no _SUCCESS
               and is treated as absent — exactly the reference's
               "re-enqueue PROCESSING rows after crash" semantics.
  * resume   = anti-join the input's (url, warc_ts) keys against the keys
               already present in the stage output (`todo_keys`), mirroring
               the reference's re-materialization of missing ENQUEUED rows.
  * idempotent re-runs: stage writes are whole-directory overwrites or
    key-disjoint appends — the Spark replacement for the reference's
    delete-then-reinsert per record (service/DocProcAiService.py:102-103)
    and ON CONFLICT upserts (persistence/SegmentDbConnector.py:101-124).

This is the parquet-with-manifest fallback chosen at milestone M0 (no Iceberg
runtime jar in the sandbox — SURVEY.md §7); the writer surface is one class so
an Iceberg-backed implementation can swap in behind `StageStore`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

KEYS = ["url", "warc_ts"]


class StageStore:
    """Directory-per-stage parquet store with _SUCCESS + manifest.json."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    # ------------------------------------------------------------- state
    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), "_SUCCESS")) and os.path.exists(
            self._manifest_path(stage)
        )

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    # ---------------------------------------------------------------- IO
    def write(self, stage: str, df: DataFrame, partition_by: list[str] | None = None) -> DataFrame:
        """Overwrite the stage output; manifest committed only after _SUCCESS."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(stage))
        out = self.read(stage)
        self._commit_manifest(stage, rows=out.count(), partition_by=partition_by or [])
        return out

    def append_new(self, stage: str, df: DataFrame, keys: list[str] = KEYS) -> DataFrame:
        """Append only rows whose key tuple is not already present (idempotent).

        The anti-join replaces the reference's existence-check-before-insert
        (service/DocProcAiService.py:360-366).
        """
        if self.is_done(stage):
            # Materialize done-keys BEFORE appending — the anti-join must not
            # lazily re-list the directory it is being appended into.
            done = self.read(stage).select(*keys).distinct().localCheckpoint()
            df = df.join(done, keys, "left_anti")
            df.write.mode("append").parquet(self.path(stage))
        else:
            df.write.mode("overwrite").parquet(self.path(stage))
        out = self.read(stage)
        self._commit_manifest(stage, rows=out.count(), partition_by=[])
        return out

    def upsert(self, stage: str, df: DataFrame, keys: list[str] = KEYS) -> DataFrame:
        """MERGE semantics: rows whose key tuple already exists are REPLACED by
        the incoming rows; new keys are appended — the reference's ON CONFLICT
        DO UPDATE (persistence/SegmentDbConnector.py:101-124,
        MediaRecordInfoDbConnector.py:26-38) as read → anti-join → union →
        atomic directory swap. Crash windows: after the old dir is removed but
        before the swap dir is renamed, the stage has no _SUCCESS and is
        treated as absent (torn write) — the normal recovery path recomputes
        it; a leaked .swap dir is cleaned on the next upsert."""
        import shutil

        swap = self.path(stage) + ".swap"
        shutil.rmtree(swap, ignore_errors=True)  # clear any crash-leaked swap
        if self.is_done(stage):
            old = self.read(stage)
            new_keys = df.select(*keys).distinct()
            kept = old.join(new_keys, keys, "left_anti")
            merged = kept.unionByName(df)
            merged.write.mode("overwrite").parquet(swap)
            self.invalidate(stage)  # manifest+_SUCCESS gone BEFORE the dir swap
            shutil.rmtree(self.path(stage))
            os.rename(swap, self.path(stage))
        else:
            df.write.mode("overwrite").parquet(self.path(stage))
        out = self.read(stage)
        self._commit_manifest(stage, rows=out.count(), partition_by=[])
        return out

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self.path(stage))

    def _commit_manifest(self, stage: str, rows: int, partition_by: list[str]) -> None:
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "rows": rows, "partition_by": partition_by}, f)
        os.replace(tmp, self._manifest_path(stage))  # atomic rename

    # ------------------------------------------------------------ resume
    def todo_keys(self, stage: str, inputs: DataFrame, keys: list[str] = KEYS) -> DataFrame:
        """Input rows whose keys are NOT yet in the stage output (crash resume)."""
        if not self.is_done(stage):
            return inputs
        done = self.read(stage).select(*keys).distinct()
        return inputs.join(done, keys, "left_anti")

    def invalidate(self, stage: str) -> None:
        """Drop a stage's manifest (test hook for torn-write simulation)."""
        p = self._manifest_path(stage)
        if os.path.exists(p):
            os.remove(p)
        success = os.path.join(self.path(stage), "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
