"""Similarity search over embedding columns (capability C11 + ANN scale path).

Baseline: exact top-k cosine — score every row, `orderBy().limit(k)`. Spark
plans TakeOrderedAndProject: per-partition top-k heaps + driver merge, the
distributed two-phase top-k for free (SURVEY.md §2.5). This matches the
reference's KNN exactly: pgvector with NO index is a sequential exact scan
(reference: persistence/SegmentDbConnector.py:223-267 — no ivfflat/hnsw DDL
exists in persistence/).

Scale path: random-hyperplane LSH (sign-bit buckets). Bucketing is a single
narrow pandas-UDF pass (numpy matmul per Arrow batch); queries probe their own
bucket plus Hamming-1 neighbors, then score exactly within candidates. At
10⁹ vectors this turns a full scan into ~(probes/2^bits) of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vector import cosine_similarity


def topk_cosine(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity (TakeOrderedAndProject)."""
    q = F.lit(query).cast("array<float>")
    return (
        vectors.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q.cast("array<double>")).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _planes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float64)


def make_bucket_udf(dim: int, n_bits: int = 12, seed: int = 7):
    """embedding → int bucket id = sign bits against fixed random hyperplanes."""
    planes = _planes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket_udf(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())  # (batch, dim) — one matmul per Arrow batch
        bits = (mat @ planes) > 0
        return pd.Series(bits @ weights)

    return bucket_udf


def bucketize(vectors: DataFrame, dim: int, n_bits: int = 12, seed: int = 7,
              vec_col: str = "embedding") -> DataFrame:
    """Persistable LSH index: adds a `bucket` column (narrow, one pass)."""
    b = make_bucket_udf(dim, n_bits, seed)
    return vectors.withColumn("bucket", b(F.col(vec_col)))


def ann_topk(
    bucketed: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket (+ Hamming-`multiprobe`
    neighbors), score exactly within candidates.

    The bucket filter is a partition-prunable equality IN-list — on a
    bucket-partitioned table Spark reads only the probed buckets.
    """
    planes = _planes(dim, n_bits, seed)
    qv = np.asarray(query, dtype=np.float64)
    qbits = (qv @ planes) > 0
    base = int((qbits * (1 << np.arange(n_bits))).sum())
    probes = [base]
    if multiprobe >= 1:
        probes += [base ^ (1 << i) for i in range(n_bits)]
    if multiprobe >= 2:
        probes += [base ^ (1 << i) ^ (1 << j) for i in range(n_bits) for j in range(i + 1, n_bits)]
    cand = bucketed.filter(F.col("bucket").isin(probes))
    q = F.lit([float(x) for x in query]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_train_centroids(
    vectors: DataFrame,
    dim: int,
    n_lists: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means (Lloyd, fixed seed) on a
    BOUNDED driver sample — the standard FAISS-style recipe where the
    quantizer trains on a sample and the full corpus is only ever ASSIGNED
    (one narrow pass). limit() bounds the collect regardless of corpus size.
    Unit-normalized centroids so assignment maximizes cosine via dot."""
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in vectors.select(vec_col).limit(sample_rows).collect()]
    )
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign(vectors: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add `list_id` = argmax cosine against the broadcast centroids — one
    matmul per Arrow batch; at scale, write partitioned by list_id so probes
    prune partitions."""
    cent = centroids  # captured in the UDF closure (broadcast via pickling)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cent.T).argmax(axis=1).astype(np.int32))

    return vectors.withColumn("list_id", assign_udf(F.col(vec_col)))


def ivf_write_index(assigned: DataFrame, path: str) -> None:
    """Materialize the IVF index partitioned by list_id — the layout that
    makes ivf_topk's nprobe IN-list a PARTITION filter: probing 4 of 256
    lists reads 4/256 of the files (plan-asserted in tests/test_plans.py),
    which at 100 TB is the difference between an index probe and a scan."""
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_read_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score the query against centroids on the driver, probe the
    top-`nprobe` lists (partition-prunable IN-list), exact cosine within."""
    qv = np.asarray(query, dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    probes = [int(i) for i in (centroids @ qn).argsort()[::-1][:nprobe]]
    cand = assigned.filter(F.col("list_id").isin(probes))
    q = F.lit([float(x) for x in query]).cast("array<double>")
    return (
        cand.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col).cast("array<double>"), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    n_bits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    n_bands: int = 1,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    exact=True: full self-join (O(n²) — oracle-checkable small-scale path).
    exact=False: LSH-bucketed candidates + exact verify (scale path). Since
    round 5 the bucketing is OR-AMPLIFIED like the MinHash text path: a pair
    is a candidate if it agrees on ALL n_bits sign bits of ANY of the
    n_bands independent hyperplane sets, so detection probability is
    1 - (1 - p^r)^b with p = 1 - θ/π, r = n_bits, b = n_bands. A single
    8-bit bucket (the old default) recalls <10% of moderate-similarity
    pairs (cos ≈ 0.4-0.6); n_bits=4/n_bands=16 recalls ≈94% at cos 0.4 and
    ≈99% at cos 0.6, at the cost of b band equi-joins + one dedup. Tune
    n_bits UP (finer buckets, fewer candidates) and n_bands up with it when
    the target regime is high-cosine near-dups. Every candidate is verified
    with the exact cosine, so precision is always 1 — bucketing may miss
    but never invents pairs.
    """
    if n_bands < 1:
        raise ValueError("n_bands must be >= 1")
    left = vectors.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    right = vectors.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    if exact:
        pairs = left.crossJoin(right).filter(F.col("id1") < F.col("id2"))
    else:
        cand = None
        for band in range(n_bands):
            b = bucketize(vectors, dim, n_bits, seed + band, vec_col)
            lb = b.select(F.col(id_col).alias("id1"), "bucket")
            rb = b.select(F.col(id_col).alias("id2"), "bucket")
            p = lb.join(rb, "bucket").filter(F.col("id1") < F.col("id2")).drop("bucket")
            cand = p if cand is None else cand.unionByName(p)
        # dedupe multi-band hits on the slim id pair FIRST, then fetch the
        # vectors once — carrying vectors through the union would shuffle
        # n_bands copies of every embedding
        pairs = cand.distinct().join(left, "id1").join(right, "id2")
    return (
        pairs.withColumn(
            "cos_sim",
            cosine_similarity(F.col("v1").cast("array<double>"), F.col("v2").cast("array<double>")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "cos_sim")
    )
