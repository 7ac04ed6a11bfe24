"""Dedup + similarity operators over the driver-provided documents/embeddings
tables (sf0.001) and synthetic planted cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from docprocai_service_spark.operators.dedup import (
    dedup_exact,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from docprocai_service_spark.operators.similarity import (
    ann_topk,
    bucketize,
    cosine_pairs,
    topk_cosine,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # plant: an exact duplicate of doc 0 and a near-duplicate of doc 1
    rows = base.limit(2).collect()
    extra = [
        (900001, rows[0]["text"], rows[0]["lang"], rows[0]["source"], rows[0]["n_chars"]),
        (900002, rows[1]["text"] + " extra tail words appended here", rows[1]["lang"], rows[1]["source"], rows[1]["n_chars"]),
    ]
    return base.unionByName(spark.createDataFrame(extra, base.schema)).localCheckpoint()


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()


def test_dedup_exact_collapses_planted_duplicate(spark, docs):
    keep = dedup_exact(docs)
    assert keep.count() == docs.count() - 1  # the planted exact dup collapses
    g = keep.filter(F.col("group_size") > 1).collect()
    assert len(g) == 1 and g[0]["group_size"] == 2


def test_minhash_near_dup_finds_planted_pair(spark, docs):
    doc1 = docs.filter(F.col("doc_id") == 900002).collect()[0]
    pairs = {(r["id1"], r["id2"]) for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()}
    base_id = docs.orderBy("doc_id").limit(2).collect()[1]["doc_id"]
    assert (base_id, 900002) in pairs or (900002, base_id) in pairs
    assert doc1 is not None


def test_simhash_near_dup_finds_exact_dup(spark, docs):
    pairs = simhash_near_dup_pairs(docs, max_hamming=3)
    ids = {(r["id1"], r["id2"]) for r in pairs.collect()}
    first_id = docs.orderBy("doc_id").first()["doc_id"]
    assert (first_id, 900001) in ids or (900001, first_id) in ids


def test_ngram_jaccard_pairs_threshold_monotone(spark, docs):
    lo = ngram_jaccard_pairs(docs, threshold=0.5).count()
    hi = ngram_jaccard_pairs(docs, threshold=0.9).count()
    assert hi <= lo


def test_topk_cosine_matches_numpy(spark, vectors):
    rows = vectors.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:10]
    want = list(ids[order])
    got = [r["vec_id"] for r in topk_cosine(vectors, list(map(float, q)), k=10).collect()]
    assert got == want


def test_ann_recall_on_planted_neighbors(spark, vectors):
    """Sign-LSH recall is only meaningful for genuinely-close vectors (the
    sf embeddings' top-10 sit at cos≈0.3 — near-random hyperplane bits, where
    NO bucketing scheme beats a scan). Plant 20 true neighbors (cos≈0.99)
    and require ANN to find them through one round of multiprobing."""
    rows = vectors.limit(1).collect()
    q = np.array(rows[0]["embedding"], dtype=np.float64)
    dim = len(q)
    rng = np.random.default_rng(3)
    planted = [
        (910000 + i, [float(x) for x in (q + 0.02 * rng.standard_normal(dim))], 99)
        for i in range(20)
    ]
    all_vecs = vectors.unionByName(
        spark.createDataFrame(planted, vectors.schema)
    ).localCheckpoint()
    exact = [r["vec_id"] for r in topk_cosine(all_vecs, list(map(float, q)), k=10).collect()]
    assert all(v == rows[0]["vec_id"] or v >= 910000 for v in exact)
    b = bucketize(all_vecs, dim=dim, n_bits=8).localCheckpoint()
    approx = [r["vec_id"] for r in ann_topk(b, list(map(float, q)), dim=dim, k=10, n_bits=8, multiprobe=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_cosine_pairs_exact_vs_bucketed(spark, vectors):
    dim = len(vectors.first()["embedding"])
    small = vectors.limit(120).localCheckpoint()
    exact = {(r["id1"], r["id2"]) for r in cosine_pairs(small, 0.95, dim, exact=True).collect()}
    approx = {(r["id1"], r["id2"]) for r in cosine_pairs(small, 0.95, dim, exact=False).collect()}
    assert approx <= exact  # bucketing may miss but never invents pairs


def test_ivf_recall_vs_exact(spark, vectors):
    from docprocai_service_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
    )

    dim = len(vectors.first()["embedding"])
    cent = ivf_train_centroids(vectors, dim=dim, n_lists=8, iters=5)
    assert cent.shape == (8, dim)
    assigned = ivf_assign(vectors, cent).localCheckpoint()
    # every vector lands in exactly one list; lists are non-degenerate
    n_lists_used = assigned.select("list_id").distinct().count()
    assert 2 <= n_lists_used <= 8
    q = [float(x) for x in vectors.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in topk_cosine(vectors, q, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(assigned, cent, q, k=10, nprobe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7  # nprobe=4 of 8 lists recovers most true neighbors
    # determinism: same seed -> same centroids -> same result
    cent2 = ivf_train_centroids(vectors, dim=dim, n_lists=8, iters=5)
    assert np.allclose(cent, cent2)


def test_cosine_pairs_banded_recall_at_moderate_threshold(spark, vectors):
    """Round 5: OR-amplified banding (n_bands independent hyperplane sets,
    union of band joins) lifts bucketed recall at moderate thresholds from
    <10% (single 8-bit bucket) to the 1-(1-p^r)^b theory value (~0.94 at
    cos 0.4 with r=4, b=16). Still a strict subset of exact — candidates
    are always exact-verified."""
    dim = len(vectors.first()["embedding"])
    small = vectors.limit(200).localCheckpoint()
    exact = {(r["id1"], r["id2"]) for r in cosine_pairs(small, 0.4, dim, exact=True).collect()}
    banded = {
        (r["id1"], r["id2"])
        for r in cosine_pairs(small, 0.4, dim, n_bits=4, n_bands=16, exact=False).collect()
    }
    assert banded <= exact
    if exact:
        assert len(banded) / len(exact) >= 0.8, (len(banded), len(exact))


def test_jvm_word_jaccard_verify_matches_python_oracle(spark):
    """r7: similarity_edges' word-mode exact verify moved from the Arrow
    jaccard UDF to pure-JVM array_intersect/array_union over word_ngrams
    gram sets. Pin the JVM sim expression to the scalar Python oracle
    (functions.hashing.jaccard) on adversarial strings: empty, blank,
    sub-n-token, unicode whitespace, duplicates-within-text, punctuation."""
    from docprocai_service_spark.functions.hashing import jaccard
    from docprocai_service_spark.operators.contamination import word_ngrams

    texts = [
        "", "   ", "one", "one two", "one two three",
        "a b c d e f g", "a b c a b c a b c", "A B c D", "a b c d e",
        "word word word word", "x. y! z? p, q", "tail a b c d tail",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, t string")
    pairs = df.alias("l").crossJoin(df.alias("r")).select(
        F.col("l.id").alias("i"), F.col("r.id").alias("j"),
        F.col("l.t").alias("t1"), F.col("r.t").alias("t2"),
    )
    g1 = F.coalesce(word_ngrams(F.col("t1"), 3), F.array().cast("array<string>"))
    g2 = F.coalesce(word_ngrams(F.col("t2"), 3), F.array().cast("array<string>"))
    sim = F.when((F.size(g1) == 0) & (F.size(g2) == 0), F.lit(1.0)).otherwise(
        F.size(F.array_intersect(g1, g2)).cast("double") / F.size(F.array_union(g1, g2))
    )
    got = {(r["i"], r["j"]): r["s"] for r in pairs.withColumn("s", sim).collect()}
    for i, t1 in enumerate(texts):
        for j, t2 in enumerate(texts):
            want = jaccard(t1, t2, shingle="word", n=3)
            assert abs(got[(i, j)] - want) < 1e-12, (t1, t2, got[(i, j)], want)
