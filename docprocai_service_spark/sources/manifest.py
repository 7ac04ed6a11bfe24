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

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

KEYS = ["url", "warc_ts"]

#: Partition column for the bucketed stage layout. Upserts rewrite only the
#: buckets an incoming batch touches (dynamic partition overwrite) — at
#: 100 TB this is the difference between an O(batch) and an O(table) merge.
BUCKET_COL = "__bucket"


def _bucket_expr(keys: list[str], n_buckets: int):
    """Deterministic key bucket: pmod(xxhash64(keys), n) — stable across runs
    and executors, so the same key always lands in the same partition dir."""
    return F.pmod(
        F.xxhash64(*[F.col(k).cast("string") for k in keys]), F.lit(n_buckets)
    ).cast("int")


def content_fingerprint(df: DataFrame, cols: list[str]) -> tuple[int, str]:
    """Order-free content fingerprint of `df` over `cols`: (row count,
    "count:bit_xor-of-row-xxhash64"). One cheap agg job; the commutative
    xor makes it independent of partitioning/ordering AND overflow-free
    under Spark 4's ANSI mode (a long SUM over hashes raises — same reason
    plans/pipeline.lineage_rows uses bit_xor). Used as the alias-dict
    staleness detector (canon_map manifests) and the merge-intent delta id
    (streaming/incremental.py)."""
    row = (
        df.select(F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("__h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(__h)").alias("h"))
        .first()
    )
    return int(row["n"]), f"{row['n']}:{row['h']}"


def _observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach a row-count observation so the WRITE job itself yields the
    manifest count — no post-write rescan of the output (the round-2
    count-by-rescan was a full extra table scan per stage per batch)."""
    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


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

    def _bucket_meta_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.buckets.json")

    # ------------------------------------------------------------- state
    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), "_SUCCESS")) and os.path.exists(
            self._manifest_path(stage)
        )

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def annotate(self, stage: str, meta: dict) -> None:
        """Merge extra keys into a committed stage's manifest (atomic
        rename) — e.g. stamping a legacy canon_map with the alias-dict
        fingerprint it is assumed to derive from."""
        doc = self.manifest(stage)
        doc.update(meta)
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path(stage))

    # ---------------------------------------------------------------- IO
    def has_staging_leak(self, stage: str) -> bool:
        """Leaked .spark-staging dir = a dynamic-partition-overwrite job died
        mid-commit (some bucket dirs swapped, others not). Callers doing
        ADDITIVE merges must treat the stage data as ambiguous and repair
        exactly — upsert's own recount only fixes the manifest row count."""
        return bool(glob.glob(os.path.join(self.path(stage), ".spark-staging*")))

    def write(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> DataFrame:
        """Overwrite the stage output; manifest committed only after _SUCCESS.
        Row count comes from an observe() on the write job — metadata-only
        commit, no rescan. `meta` entries are recorded in the manifest (e.g.
        the alias-dict fingerprint a canon_map was derived from)."""
        obs_df, obs = _observed(df)
        writer = obs_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(stage))
        # a plain overwrite replaces any bucketed layout → the sticky modulus
        # sidecar no longer describes the data on disk
        if os.path.exists(self._bucket_meta_path(stage)):
            os.remove(self._bucket_meta_path(stage))
        self._commit_manifest(
            stage, rows=int(obs.get["rows"]), partition_by=partition_by or [], meta=meta
        )
        return self.read(stage)

    def append_new(self, stage: str, df: DataFrame, keys: list[str] = KEYS) -> DataFrame:
        """Append only rows whose key tuple is not already present (idempotent).

        The anti-join replaces the reference's existence-check-before-insert
        (service/DocProcAiService.py:360-366).
        """
        if self.is_done(stage):
            # Materialize done-keys BEFORE appending — the anti-join must not
            # lazily re-list the directory it is being appended into.
            done = self.read(stage).select(*keys).distinct().localCheckpoint()
            obs_df, obs = _observed(df.join(done, keys, "left_anti"))
            obs_df.write.mode("append").parquet(self.path(stage))
            rows = self.manifest(stage)["rows"] + int(obs.get["rows"])
        else:
            obs_df, obs = _observed(df)
            obs_df.write.mode("overwrite").parquet(self.path(stage))
            rows = int(obs.get["rows"])
        self._commit_manifest(stage, rows=rows, partition_by=[])
        return self.read(stage)

    def upsert(
        self, stage: str, df: DataFrame, keys: list[str] = KEYS, n_buckets: int = 64
    ) -> DataFrame:
        """MERGE semantics: rows whose key tuple already exists are REPLACED by
        the incoming rows; new keys are appended — the reference's ON CONFLICT
        DO UPDATE (persistence/SegmentDbConnector.py:101-124,
        MediaRecordInfoDbConnector.py:26-38), bucket-scoped:

        The stage is laid out partitioned by `__bucket = pmod(xxhash64(keys),
        n_buckets)`. A merge reads ONLY the buckets the incoming batch touches
        (partition pruning on an IN-list of ≤ n_buckets ints), anti-joins the
        replaced keys, and rewrites ONLY those buckets via dynamic partition
        overwrite — untouched buckets are never read or written, so merge cost
        is O(touched buckets), not O(table).

        Crash contract (no committed row is ever lost):
          * mid-write crash: new files live in a hidden .spark-staging dir;
            committed data + manifest untouched; replay converges.
          * mid-commit crash (some buckets swapped): every swapped bucket holds
            kept∪new for that bucket — a superset of nothing, a loss of
            nothing; replaying the in-flight batch (which never got an ack)
            converges. A leaked staging dir marks this; the next upsert then
            recounts exactly instead of trusting manifest arithmetic.
          * write-committed-but-manifest-missing crash: adopted on entry
            (_SUCCESS present → re-commit manifest), never rebuilt from the
            incoming batch alone.
          * legacy pre-bucketed `.swap` crash window: a completed swap dir
            (has _SUCCESS) is adopted by finishing the interrupted rename —
            previously-committed rows survive."""
        target = self.path(stage)
        self._recover(stage)
        crashed = bool(glob.glob(os.path.join(target, ".spark-staging*")))
        # A bucketed stage whose modulus is unrecorded (manifest + sidecar
        # both lost) cannot be merged bucket-scoped: a guessed modulus reads
        # back the wrong dirs and stale rows survive as duplicates. Route it
        # through the full-rebucket migration path below (one-time, exact).
        modulus_known = self._recorded_n_buckets(stage) is not None or not self._is_bucketed(stage)
        n_b = self._n_buckets(stage, n_buckets)
        if modulus_known:
            self._write_bucket_meta(stage, n_b)  # modulus durable before any data write
        # (unknown modulus: recording the guessed default BEFORE the rebucket
        # migration completes would let a crashed migration replay as a
        # bucket-scoped merge under the wrong modulus — record it only after
        # the swap rename below)
        dfb = df.withColumn(BUCKET_COL, _bucket_expr(keys, n_b)).persist()
        try:
            if self.is_done(stage) and self._is_bucketed(stage) and modulus_known:
                raw_old = self.spark.read.parquet(target)
                hot = [r[0] for r in dfb.select(BUCKET_COL).distinct().collect()]
                old_hot, obs_old = _observed(raw_old.where(F.col(BUCKET_COL).isin(hot)))
                kept = old_hot.join(dfb.select(*keys).distinct(), keys, "left_anti")
                merged, obs_out = _observed(kept.unionByName(dfb))
                (
                    merged.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(BUCKET_COL)
                    .parquet(target)
                )
                if crashed:
                    # a previous job died mid-commit: manifest arithmetic is
                    # untrustworthy once — recount exactly, then clean up.
                    rows = self.spark.read.parquet(target).count()
                    for leak in glob.glob(os.path.join(target, ".spark-staging*")):
                        shutil.rmtree(leak, ignore_errors=True)
                else:
                    rows = (
                        self.manifest(stage)["rows"]
                        - int(obs_old.get["rows"])
                        + int(obs_out.get["rows"])
                    )
            elif self.is_done(stage):
                # one-time migration of a legacy unbucketed stage into the
                # bucketed layout: full merge through an atomic dir swap
                # (recoverable — see _recover).
                swap = target + ".swap"
                shutil.rmtree(swap, ignore_errors=True)
                old = self.read(stage)
                kept = old.join(dfb.select(*keys).distinct(), keys, "left_anti").withColumn(
                    BUCKET_COL, _bucket_expr(keys, n_b)
                )
                merged, obs_out = _observed(kept.unionByName(dfb))
                merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(swap)
                rows = int(obs_out.get["rows"])
                self.invalidate(stage)  # manifest+_SUCCESS gone BEFORE the dir swap
                shutil.rmtree(target)
                os.rename(swap, target)
                self._write_bucket_meta(stage, n_b)
            else:
                obs_df, obs = _observed(dfb)
                obs_df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target)
                rows = int(obs.get["rows"])
            self._commit_manifest(stage, rows=rows, partition_by=[BUCKET_COL], n_buckets=n_b)
        finally:
            dfb.unpersist()
        return self.read(stage)

    def _recover(self, stage: str) -> None:
        """Complete interrupted upserts instead of discarding committed rows."""
        target = self.path(stage)
        swap = target + ".swap"
        if not self.is_done(stage) and os.path.exists(os.path.join(swap, "_SUCCESS")):
            # crash between invalidate() and the swap rename: the swap dir IS
            # the complete merged output — finish the rename.
            shutil.rmtree(target, ignore_errors=True)
            os.rename(swap, target)
            self._commit_manifest(
                stage, rows=self.spark.read.parquet(target).count(),
                partition_by=[BUCKET_COL] if self._is_bucketed(stage) else [],
                n_buckets=self._bucket_meta(stage) if self._is_bucketed(stage) else None,
            )
        shutil.rmtree(swap, ignore_errors=True)  # incomplete swap: safe to drop
        if not self.is_done(stage) and os.path.exists(os.path.join(target, "_SUCCESS")):
            # write job committed but manifest commit was interrupted: adopt —
            # WITH the sticky bucket modulus from the sidecar (re-committing
            # without it let a later different-default upsert split the layout).
            self._commit_manifest(
                stage, rows=self.spark.read.parquet(target).count(),
                partition_by=[BUCKET_COL] if self._is_bucketed(stage) else [],
                n_buckets=self._bucket_meta(stage) if self._is_bucketed(stage) else None,
            )

    def _is_bucketed(self, stage: str) -> bool:
        return bool(glob.glob(os.path.join(self.path(stage), f"{BUCKET_COL}=*")))

    def _recorded_n_buckets(self, stage: str) -> int | None:
        """The stage's durably-recorded bucket modulus, or None if neither
        the manifest nor the sidecar buckets.json records one."""
        try:
            n = self.manifest(stage).get("n_buckets")
            if n is not None:
                return int(n)
        except FileNotFoundError:
            pass
        sticky = self._bucket_meta(stage)
        return int(sticky) if sticky is not None else None

    def _n_buckets(self, stage: str, default: int) -> int:
        """Bucket count is sticky per stage so a caller changing the default
        cannot silently split the layout. Source of truth: the manifest,
        falling back to the sidecar buckets.json — which survives manifest
        loss (the _recover paths used to re-commit WITHOUT n_buckets, after
        which a different-default upsert bucketed keys with the wrong modulus
        and stale rows survived as duplicates)."""
        recorded = self._recorded_n_buckets(stage)
        return recorded if recorded is not None else default

    def _bucket_meta(self, stage: str) -> int | None:
        try:
            with open(self._bucket_meta_path(stage)) as f:
                return int(json.load(f)["n_buckets"])
        except (FileNotFoundError, KeyError, ValueError):
            return None

    def _write_bucket_meta(self, stage: str, n_buckets: int) -> None:
        """Sidecar record of the stage's bucket modulus, written BEFORE the
        data write (atomic tmp+rename): a crash at any later point leaves the
        modulus recoverable, and a full-directory overwrite of the stage data
        cannot destroy it (it lives next to the manifest, not in the dir)."""
        tmp = self._bucket_meta_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "n_buckets": n_buckets}, f)
        os.replace(tmp, self._bucket_meta_path(stage))

    def read(self, stage: str) -> DataFrame:
        df = self.spark.read.parquet(self.path(stage))
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def read_pruned(self, stage: str, on: DataFrame, keys: list[str]) -> DataFrame:
        """Rows of `stage` lying ONLY in the buckets touched by `on`'s key
        tuples — a partition-pruned readback for merge paths. `plain read +
        semi-join` scans the whole table (the semi-join happens after the
        scan); this filters the partition column first, so the parquet
        listing prunes to ≤ n_buckets dirs and the read is O(touched
        buckets), matching upsert's write-side contract."""
        if not self._is_bucketed(stage):
            return self.read(stage)
        n_b = self._recorded_n_buckets(stage)
        if n_b is None:
            # Modulus unrecorded (legacy store with a non-default bucket
            # count whose manifest AND sidecar were both lost): guessing a
            # modulus here would prune away live rows for touched keys and a
            # merge would then DROP prior weights instead of summing them
            # (ADVICE r4). Unpruned read is correct, just slower — and the
            # next upsert re-records the modulus durably.
            return self.read(stage)
        hot = [
            r[0]
            for r in on.select(_bucket_expr(keys, n_b).alias("b")).distinct().collect()
        ]
        raw = self.spark.read.parquet(self.path(stage))
        return raw.where(F.col(BUCKET_COL).isin(hot)).drop(BUCKET_COL)

    def _commit_manifest(
        self,
        stage: str,
        rows: int,
        partition_by: list[str],
        n_buckets: int | None = None,
        meta: dict | None = None,
    ) -> None:
        doc = {"stage": stage, "rows": rows, "partition_by": partition_by}
        if n_buckets is not None:
            doc["n_buckets"] = n_buckets
        if meta:
            doc.update(meta)
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
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
