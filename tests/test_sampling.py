"""Deterministic mixture sampling (operators/sampling.py): engine-portable
survivor set (DuckDB side-by-side oracle), partitioning invariance, recipe
semantics, and rate realization on the real documents table."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from docprocai_service_spark.operators.sampling import (
    md5_frac,
    mixture_report,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"
RATES = {"src1": 1.0, "src2": 0.5, "src3": 0.25, "src4": 0.0}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint()


def test_survivors_match_duckdb_oracle(spark, docs):
    """The exact survivor id set is reproducible in DuckDB from the same
    recipe — the engine-portability contract (same md5 arithmetic as the
    shard_assign_docs oracle)."""
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, RATES, default_rate=0.1).select("doc_id").collect()
    )
    cases = " ".join(f"WHEN '{g}' THEN {r}" for g, r in sorted(RATES.items()))
    want = sorted(
        x[0]
        for x in duckdb.sql(
            f"""SELECT doc_id FROM '{SF_DIR}/documents.parquet'
                WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                      / 4294967296.0
                      < (CASE source {cases} ELSE 0.1 END)"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_partitioning_and_rerun_invariance(spark, docs):
    a = sorted(r["doc_id"] for r in stratified_sample(docs, RATES).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), RATES).select("doc_id").collect()
    )
    assert a == b


def test_recipe_semantics_and_report(spark, docs):
    s = stratified_sample(docs, RATES, default_rate=0.0)
    rep = {r["source"]: r for r in mixture_report(docs, s).collect()}
    # rate 1.0 keeps everything, rate 0.0 and unknown strata drop everything
    assert rep["src1"]["realized_rate"] == 1.0
    assert rep["src4"]["rows_kept"] == 0
    unknown = [g for g in rep if g not in RATES]
    assert unknown and all(rep[g]["rows_kept"] == 0 for g in unknown)
    # fractional strata realize near their recipe (small-n tolerance)
    for g, r in [("src2", 0.5), ("src3", 0.25)]:
        n = rep[g]["rows_in"]
        assert abs(rep[g]["realized_rate"] - r) <= 3 * (r * (1 - r) / n) ** 0.5 + 0.02
    # validation: out-of-range rates raise
    with pytest.raises(ValueError):
        stratified_sample(docs, {"src1": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(docs, RATES, default_rate=-0.1)


def test_no_shuffle_plan(spark, docs):
    s = stratified_sample(docs, RATES)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
