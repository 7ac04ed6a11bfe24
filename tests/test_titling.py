"""Batch titling with rewind: packing, rewind, determinism, group isolation."""

from __future__ import annotations

import pytest

from docprocai_service_spark.operators.titling import stub_titler, title_segments


@pytest.fixture(scope="module")
def segments(spark):
    rows = []
    for g, n_seg in (("lecA", 7), ("lecB", 2)):
        for p in range(n_seg):
            rows.append((g, p, f"{g} segment {p} " + "w " * (p * 3)))
    return spark.createDataFrame(rows, "parent_id string, position long, text string").localCheckpoint()


def test_every_segment_gets_exactly_one_title(spark, segments):
    out = title_segments(segments, budget_tokens=16).collect()
    assert len(out) == segments.count()
    keys = {(r["group"], r["position"]) for r in out}
    assert len(keys) == len(out)
    assert all(r["title"] for r in out)


def test_rewind_forces_multiple_batches(spark, segments):
    """max_answers=2 on a 7-segment group must produce ≥4 batches for lecA —
    the rewind path (answered < sent) runs."""
    out = title_segments(
        segments, budget_tokens=1000, titler=stub_titler(max_answers=2)
    ).collect()
    a_batches = {r["batch_no"] for r in out if r["group"] == "lecA"}
    assert len(a_batches) >= 4
    # batches are assigned in position order (monotone)
    a = sorted((r["position"], r["batch_no"]) for r in out if r["group"] == "lecA")
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(a, a[1:]))


def test_budget_packs_batches(spark, segments):
    """With a generous titler, batch splits come only from the token budget."""
    out = title_segments(
        segments, budget_tokens=8, titler=stub_titler(max_answers=100)
    ).collect()
    a_batches = {r["batch_no"] for r in out if r["group"] == "lecA"}
    assert len(a_batches) > 1  # 7 growing segments cannot fit one 8-token batch


def test_deterministic_and_partition_invariant(spark, segments):
    a = sorted(map(tuple, title_segments(segments, budget_tokens=16).collect()))
    b = sorted(map(tuple, title_segments(segments.repartition(7), budget_tokens=16).collect()))
    assert a == b
