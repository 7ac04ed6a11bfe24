"""c-TF-IDF tag generation (capability §2.4 term counting).

The reference computes per-record keyword tags with CountVectorizer 1-3-gram
counts + class-TF-IDF inside BERTopic
(reference: fileextractlib/TopicModel.py:54-71, applied per record at
service/DocProcAiService.py:232-235, persisted as `tags text[]`). Here the
same math is a declarative DataFrame plan:

  tokenize (split/lower, pure JVM) → n-gram expand (transform over the token
  array, no UDF) → explode → groupBy(group, term).count() → class-TF-IDF via
  two small joins → top-k terms per group (row_number with total tie-break).

Scoring is BERTopic's class-TF-IDF: score(t, c) = tf_{t,c} · ln(1 + A / f_t)
where f_t is the term's frequency across ALL classes and A is the average
total term count per class.

Scale notes: the only wide ops are groupBy(group, term) and groupBy(term) —
hash partial+final aggregations on uniformly-hashed string keys; the A scalar
is a 1-row aggregate crossJoin-broadcast (no driver action, stays lazy); the
per-group top-k window shuffles once on `group`. At 100 TB the term
vocabulary, not the corpus, bounds the joined state — n-gram vocabularies
grow sublinearly with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_REGEX = r"\W+"


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_REGEX),
        lambda x: x != F.lit(""),
    )


def term_counts(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_ngram: int = 2,
) -> DataFrame:
    """(group, term, tf): 1..max_ngram word-gram counts per group (pure JVM).

    ONE scan + ONE tokenization + ONE explode for all gram sizes: each row's
    1..max_ngram gram arrays are concat'ed and exploded together. The old
    shape unioned a separate branch per gram size, re-scanning the corpus and
    re-running the tokenizer split max_ngram times (guide §2.3 "don't compute
    things you throw away" — the union's branches shared no work). The
    exploded multiset is identical, so the groupBy counts are unchanged.
    Small-file inputs are spread first (guide §6): a few-MB parquet corpus is
    1-2 scan splits, which would run the whole explode+partial-agg pipeline
    on 1-2 cores; the guard is a no-op on real multi-split inputs.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        df = df.repartition(par)
    base = df.select(F.col(group_col).alias("group"), _tokens(text_col).alias("ws"))
    gram_arrays = ["ws"]
    for n in range(2, max_ngram + 1):
        joined = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n)).replace("ws[i + 0]", "ws[i]")
        gram_arrays.append(
            f"CASE WHEN size(ws) >= {n} "
            f"THEN transform(sequence(0, size(ws) - {n}), i -> {joined}) "
            f"ELSE CAST(array() AS array<string>) END"
        )
    grams = gram_arrays[0] if len(gram_arrays) == 1 else f"concat({', '.join(gram_arrays)})"
    terms = base.select("group", F.explode(F.expr(grams)).alias("term"))
    return terms.groupBy("group", "term").agg(F.count("*").alias("tf"))


def tags_tfidf(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_ngram: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """(group, term, rank, score): top-k c-TF-IDF terms per group."""
    tf = term_counts(df, text_col, group_col, max_ngram)
    f_t = tf.groupBy("term").agg(F.sum("tf").alias("f_t"))
    # A = average total terms per class — 1-row aggregate, broadcast not collect
    a = tf.groupBy("group").agg(F.sum("tf").alias("n_terms")).agg(
        F.avg("n_terms").alias("__a")
    )
    scored = (
        tf.join(f_t, "term")
        .crossJoin(F.broadcast(a))
        .withColumn("score", F.col("tf") * F.log(F.lit(1.0) + F.col("__a") / F.col("f_t")))
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("group", "term", "rank", F.round("score", 4).alias("score"))
    )


def tags_array(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_ngram: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """(group, tags array<string>) — the reference's `tags text[]` shape,
    rank-ordered (sort_array on (rank, term) structs, order-free reduction)."""
    flat = tags_tfidf(df, text_col, group_col, max_ngram, top_k)
    return flat.groupBy("group").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "term"))), lambda x: x["term"]
        ).alias("tags")
    )
