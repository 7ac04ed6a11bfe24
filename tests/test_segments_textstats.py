"""Reference-shaped segment search semantics + text-analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docprocai_service_spark.operators.segments import (
    cascade_delete_media_record,
    segment_link_exists,
    semantic_search,
    union_segments,
)
from docprocai_service_spark.operators.textstats import (
    fingerprint_md5,
    lang_id,
    make_winnow_udf,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def segments(spark):
    def seg(i, parent, emb):
        return (f"s{i}", parent, None, None, None, None, None, [float(x) for x in emb])

    docs = spark.createDataFrame(
        [seg(1, "r1", [1, 0, 0]), seg(2, "r1", [0.9, 0.1, 0]), seg(3, "r2", [0, 1, 0])],
        "id string, parent_id string, text string, page int, start_time int, transcript string, title string, embedding array<float>",
    )
    vids = spark.createDataFrame(
        [seg(4, "r2", [0, 0.9, 0.1]), seg(5, "r3", [0, 0, 1])],
        "id string, parent_id string, text string, page int, start_time int, transcript string, title string, embedding array<float>",
    )
    assess = spark.createDataFrame(
        [seg(6, "a1", [0.8, 0.2, 0]), seg(7, "a1", [1, 0, 0]), seg(8, "a2", [0, 1, 0])],
        "id string, parent_id string, text string, page int, start_time int, transcript string, title string, embedding array<float>",
    )
    return union_segments(docs, vids, assess).localCheckpoint()


def test_union_segments_sources(segments):
    counts = {r["source"]: r["count"] for r in segments.groupBy("source").count().collect()}
    assert counts == {"document": 3, "video": 2, "assessment": 3}


def test_semantic_search_reference_semantics(segments):
    res = semantic_search(segments, [1.0, 0.0, 0.0], k=5).collect()
    ids = [r["id"] for r in res]
    # s1 is the query itself (score 0) -> excluded; s7 collapses into a1 via MIN
    assert "s1" not in ids
    assert "a1" in ids  # assessment surfaces as its parent id with min score
    assert "s7" not in ids and "s6" not in ids
    scores = [r["score"] for r in res]
    assert scores == sorted(scores)


def test_semantic_search_whitelist_and_parent_exclusion(segments):
    res = semantic_search(segments, [1.0, 0.0, 0.0], k=10, whitelist=["r1", "r2"], exclude_parent="r1")
    parents = {r["parent_id"] for r in res.collect()}
    assert parents <= {"r2"}


def test_segment_link_exists_symmetric(spark):
    links = spark.createDataFrame([("c1", "s1", "s2")], "content_id string, segment1_id string, segment2_id string")
    assert segment_link_exists(links, "s1", "s2").count() == 1
    assert segment_link_exists(links, "s2", "s1").count() == 1
    assert segment_link_exists(links, "s1", "s3").count() == 0


def test_cascade_delete(spark, segments):
    links = spark.createDataFrame(
        [("c1", "s1", "s3"), ("c1", "s3", "s4"), ("c1", "s4", "s5")],
        "content_id string, segment1_id string, segment2_id string",
    )
    kept_seg, kept_links = cascade_delete_media_record(segments, links, "r1")
    assert {r["id"] for r in kept_seg.collect()} == {"s3", "s4", "s5", "s6", "s7", "s8"}
    # link s1-s3 dies with s1; links not touching r1 segments survive
    assert {(r["segment1_id"], r["segment2_id"]) for r in kept_links.collect()} == {("s3", "s4"), ("s4", "s5")}


# ------------------------------------------------------------- text stats
def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to the park",),
            ("der hund und die katze ist ein tier",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r["predicted_lang"] for r in lang_id(df).collect()]
    assert got == ["en", "de", "und"]


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",), ("one",)], "text string")
    got = [r["n"] for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_quality_score_bounds(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = quality_score(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)


def test_fingerprint_md5_normalizes_whitespace(spark):
    df = spark.createDataFrame([("A  b\tc",), ("a b c",)], "text string")
    fps = [r["fp"] for r in df.select(fingerprint_md5(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_winnow_fingerprint_robust_to_local_edit(spark):
    w = make_winnow_udf()
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and keeps running onwards",),
         ("the quick brown fox jumps over the lazy cat and keeps running onwards",)],
        "text string",
    )
    a, b = [set(r["fp"]) for r in df.select(w(F.col("text")).alias("fp")).collect()]
    overlap = len(a & b) / max(len(a | b), 1)
    assert overlap > 0.3  # local edit keeps most fingerprint windows


def test_winnow_vectorized_matches_naive_golden(spark):
    """The batch-vectorized winnow (unique-gram table + gather) must emit
    bit-identical fingerprints to the naive per-gram-crc32 formulation."""
    import zlib

    import numpy as np

    k, w = 8, 16

    def naive(t):
        if not t or len(t) < k:
            return []
        grams = [zlib.crc32(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)]
        arr = np.array(grams, dtype=np.int64)
        if len(arr) <= w:
            return sorted({int(arr.min())})
        view = np.lib.stride_tricks.sliding_window_view(arr, w)
        return sorted({int(x) for x in view.min(axis=1)})

    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "short",
        "",
        None,
        "exactly8!",  # just above the k boundary
        "unicode snowman ☃ and accents éàü repeated ☃☃ " * 3,
        "a" * 100,  # degenerate: one unique gram
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["fp"] for r in df.coalesce(1).select(make_winnow_udf(k, w)(F.col("text")).alias("fp")).collect()]
    assert got == [naive(t) for t in texts]


def test_winnow_latin_fast_path_and_small_k_match_naive(spark):
    """The uint64-packed fast path (all codepoints < 256, k<=8) and its k<8
    zero-padding must stay bit-identical to the naive formulation; a batch
    with any cp>=256 row routes through the lexsort path instead (covered by
    the golden above)."""
    import zlib

    import numpy as np

    def naive(t, k, w):
        if not t or len(t) < k:
            return []
        grams = [zlib.crc32(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)]
        arr = np.array(grams, dtype=np.int64)
        if len(arr) <= w:
            return sorted({int(arr.min())})
        view = np.lib.stride_tricks.sliding_window_view(arr, w)
        return sorted({int(x) for x in view.min(axis=1)})

    texts = [
        "plain ascii text that repeats plain ascii text " * 3,
        "latin-1 accents café façade entrée über " * 3,  # 128 <= cp < 256
        "x" * 30,
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for k, w in [(8, 16), (5, 4)]:
        got = [
            r["fp"]
            for r in df.coalesce(1)
            .select(make_winnow_udf(k, w)(F.col("text")).alias("fp"))
            .collect()
        ]
        assert got == [naive(t, k, w) for t in texts], (k, w)
