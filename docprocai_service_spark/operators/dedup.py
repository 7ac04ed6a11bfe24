"""Document deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine. First-class training-data-pipeline components over
the `documents` table (doc_id, text, lang, source, n_chars).

The reference's nearest analog is its idempotent delete-then-reinsert per
record (reference: service/DocProcAiService.py:102-103) and the all-pairs
similarity linking (service/DocProcAiService.py:710-757); these operators are
the web-corpus generalizations of that shape, built Spark-first:

  * exact        — one hash aggregation; at 100 TB this is THE first pass
                   (group on sha256(text), keep min doc_id — order-free).
  * MinHash-LSH  — shingle → signature → band bucket → equi-join; ~linear
                   candidates instead of O(n²) (operators/canonicalize.py
                   machinery with word shingles).
  * SimHash      — 64-bit sketch; pigeonhole band join (4×16-bit bands
                   guarantee recall for Hamming ≤ 3) then exact Hamming filter
                   via bit_count XOR — all JVM.
  * n-gram Jaccard — exact verification on LSH candidates (Arrow UDF).
  * embedding cosine — see operators/similarity.py:cosine_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hamming64, make_simhash_udf
from .canonicalize import similarity_edges


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep MIN(id) per identical text; emit (doc_id, group_size).

    One partial+final hash aggregation on sha256(text) — no window, no sort;
    the map-side combine makes this scan-bound at any scale.
    """
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("group_size"),
        )
        .select(id_col, "group_size")
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: str = "word",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH + exact shingle-Jaccard verify."""
    edges = similarity_edges(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("name")),
        threshold=threshold,
        k=k,
        bands=bands,
        verify="exact",
        shingle=shingle,
        n=n,
    )
    return edges.select(
        F.col("src").alias("id1"), F.col("dst").alias("id2"), F.col("sim").alias("jaccard")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash, Hamming ≤ max_hamming.

    Candidate generation by pigeonhole: split the sketch into 4 16-bit bands;
    any pair within Hamming ≤ 3 shares at least one exact band → equi-join per
    band, union, exact bit_count(XOR) filter. Entirely JVM after the sketch.
    """
    sim = make_simhash_udf()
    # spread small-file inputs before the sketch UDF (same rationale as
    # similarity_edges: a 1-partition parquet would sketch on one core)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < min(par, 8):
        docs = docs.repartition(par)
    # Lazy persist, NOT localCheckpoint: no eager barrier job, and blocks are
    # re-derivable from lineage — localCheckpoint blocks are non-replicated,
    # so on a real cluster one lost executor would kill the whole query.
    from pyspark import StorageLevel

    s = docs.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands = [
        s.select(
            "id",
            "sh",
            F.concat_ws(
                ":", F.lit(i), F.shiftright(F.col("sh"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("string")
            ).alias("band_key"),
        )
        for i in range(4)
    ]
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), "band_key")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id1"), F.col("l.sh").alias("sh1"),
                F.col("r.id").alias("id2"), F.col("r.sh").alias("sh2"))
        .distinct()
    )
    return (
        pairs.withColumn("hamming", hamming64(F.col("sh1"), F.col("sh2")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs, LSH-pruned (thin wrapper).

    k/bands tune LSH recall at the threshold: rows-per-band r = k/bands, and
    a true pair at similarity s survives with 1-(1-s^r)^bands. At a LOW
    threshold like 0.5, r=4 misses ~35% of borderline pairs — use bands=32
    (r=2, miss ≈ 1e-4) when the output must equal the exact pair set."""
    edges = similarity_edges(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("name")),
        threshold=threshold,
        verify="exact",
        shingle="word",
        n=n,
        k=k,
        bands=bands,
    )
    return edges.select(F.col("src").alias("id1"), F.col("dst").alias("id2"), F.col("sim").alias("jaccard"))
