"""Benchmark-contamination operator (operators/contamination.py): planted
contamination is flagged, clean docs are not, gram construction is
byte-identical to the MinHash shingle path, and the broadcast plan holds."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from docprocai_service_spark.functions.hashing import _shingle_list
from docprocai_service_spark.operators.contamination import (
    contaminated_docs,
    contamination_pairs,
    word_ngrams,
)

BENCH_ITEM = "the quick brown fox jumps over the lazy dog near the river bank"


@pytest.fixture(scope="module")
def tables(spark):
    corpus = spark.createDataFrame(
        [
            # planted: contains the full benchmark sentence verbatim
            (1, f"Intro text. {BENCH_ITEM} And a closing remark follows here."),
            # partial overlap: shares exactly the first 4 tokens -> two
            # common 3-grams, BELOW the min_common=3 threshold
            (2, "the quick brown fox went home early and slept all day long"),
            # clean: no shared 3-gram
            (3, "completely unrelated content about spark shuffle partitioning"),
            # empty text: no grams at all
            (4, "   "),
            # short doc (<= 3 tokens): whole text is its single gram
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, BENCH_ITEM), (101, "tiny doc")],
        "bench_id long, text string",
    )
    return corpus, bench


def test_planted_contamination_flagged(spark, tables):
    corpus, bench = tables
    pairs = {
        (r["doc_id"], r["bench_id"]): r["n_common_grams"]
        for r in contamination_pairs(corpus, bench, n=3, min_common=3).collect()
    }
    # doc 1 contains all 11 3-grams of the 13-token benchmark item
    assert pairs[(1, 100)] == len(set(_shingle_list(BENCH_ITEM, 3, word=True)))
    # doc 2's 2-gram overlap is below threshold; docs 3/4 never appear
    assert (2, 100) not in pairs
    assert all(d not in (3, 4) for d, _ in pairs)
    # short-doc whole-text gram matches the short benchmark item exactly
    loose = contamination_pairs(corpus, bench, n=3, min_common=1)
    assert loose.filter("doc_id = 5 AND bench_id = 101").count() == 1
    # doc-level rollup: doc 1 hit exactly one benchmark item
    roll = {r["doc_id"]: r for r in contaminated_docs(corpus, bench).collect()}
    assert set(roll) == {1}
    assert roll[1]["n_benchmarks_hit"] == 1
    assert roll[1]["max_common_grams"] == pairs[(1, 100)]


def test_threshold_boundary(spark, tables):
    corpus, bench = tables
    # at min_common=2 the partial-overlap doc IS flagged (exactly 2 grams:
    # "the quick brown", "quick brown fox")
    pairs = contamination_pairs(corpus, bench, n=3, min_common=2)
    row = pairs.filter("doc_id = 2 AND bench_id = 100").collect()
    assert len(row) == 1 and row[0]["n_common_grams"] == 2


def test_word_ngrams_matches_shingle_list(spark):
    """The JVM gram column and the Python MinHash shingle path must agree
    as SETS on every tokenization edge the corpus can produce."""
    cases = [
        "",
        "   ",
        "one",
        "one two",
        "one two three",
        "one two three four",
        "  Mixed   CASE \t tokens\nwith runs  ",
        "a b a b a b",  # duplicate grams -> distinct set
        "punct, stays! attached? to tokens.",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: set(r["g"])
        for r in df.select("i", word_ngrams(F.col("s"), 3).alias("g")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == set(_shingle_list(s, 3, word=True)), repr(s)


def test_benchmark_side_broadcasts(spark, tables):
    corpus, bench = tables
    plan = contamination_pairs(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
