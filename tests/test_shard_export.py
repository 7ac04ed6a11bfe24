"""Deterministic sharded training-data export (operators/materialize.py,
round-6): placement determinism, size balance, manifest integrity, and
kill-and-resume byte-identity of every shard file."""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from docprocai_service_spark.operators.materialize import (
    export_shards,
    shard_assignment,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _file_hashes(path: str) -> dict[str, str]:
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f == "data.parquet":
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = hashlib.sha256(
                    open(p, "rb").read()
                ).hexdigest()
    return out


def test_export_layout_manifest_and_balance(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    manifest = export_shards(docs, path, n_shards=8)
    assert manifest["n_shards"] == 8
    assert manifest["total_rows"] == docs.count()
    # one data.parquet per non-empty shard, marker present, readable back
    assert os.path.exists(os.path.join(path, "_EXPORT_SUCCESS"))
    back = spark.read.parquet(path)
    assert back.count() == manifest["total_rows"]
    # manifest per-shard rows match a recount, and sha256 matches the bytes
    recount = {r["shard"]: r["rows"] for r in back.groupBy("shard").count()
               .withColumnRenamed("count", "rows").collect()}
    for s in manifest["shards"]:
        assert recount[s["shard"]] == s["rows"]
        p = os.path.join(path, f"shard={s['shard']}", "data.parquet")
        assert hashlib.sha256(open(p, "rb").read()).hexdigest() == s["sha256"]
        assert os.path.getsize(p) == s["bytes"]
    # md5-uniform placement: no shard more than 3x the mean at n=500
    rows = [s["rows"] for s in manifest["shards"]]
    assert max(rows) <= 3 * (sum(rows) / len(rows))
    # placement column equals the documented pure function of doc_id
    got = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    want = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", shard_assignment(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    assert got == want


def test_kill_and_resume_byte_identical(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    export_shards(docs, path, n_shards=8)
    clean = _file_hashes(path)
    clean_manifest = json.load(open(os.path.join(path, "_manifest.json")))

    # completed export short-circuits: manifest returned, bytes untouched
    m2 = export_shards(docs, path, n_shards=8)
    assert m2 == clean_manifest and _file_hashes(path) == clean

    # kill AFTER data, BEFORE commit marker: next run rewrites, same bytes
    os.remove(os.path.join(path, "_EXPORT_SUCCESS"))
    os.remove(os.path.join(path, "_manifest.json"))
    shutil.rmtree(os.path.join(path, "shard=3"))  # torn write
    m3 = export_shards(docs, path, n_shards=8)
    assert _file_hashes(path) == clean
    assert m3 == clean_manifest

    # a from-scratch export at another location is byte-identical too
    # (placement + row order are pure functions of the data)
    path2 = str(tmp_path / "export2")
    export_shards(docs, path2, n_shards=8)
    assert _file_hashes(path2) == clean


def test_target_bytes_sizing(spark, docs, tmp_path):
    total = docs.agg(F.sum(F.octet_length("text"))).first()[0]
    path = str(tmp_path / "export")
    manifest = export_shards(docs, path, target_bytes=total // 5)
    assert manifest["n_shards"] in (5, 6)  # ceil division
    with pytest.raises(ValueError):
        export_shards(docs, str(tmp_path / "x"), n_shards=4, target_bytes=100)
    with pytest.raises(ValueError):
        export_shards(docs, str(tmp_path / "x"))
