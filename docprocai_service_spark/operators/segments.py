"""Reference-shaped segment query surface (capabilities C11 + §2.7 set ops).

Mirrors the reference's `semantic_search` SQL
(reference: persistence/SegmentDbConnector.py:228-258 driven from
service/DocProcAiService.py:559-637) with exact semantics:

  1. three filtered+scored heterogeneous sub-selects — here ONE DataFrame per
     source with a `source` discriminator, combined by
     unionByName(allowMissingColumns=True). The reference's 3-way NATURAL
     FULL JOIN is a schema-union device, NOT a join (SURVEY.md §2.3): the
     sub-selects have disjoint key spaces, so it must be translated as an
     outer union — translating it as a join would be wrong.
  2. whitelist pushdown BEFORE scoring (IN-list / broadcast semi-join)
  3. per-assessment MIN(score) collapse (groupBy.min → partial+final agg)
  4. global ORDER BY score LIMIT k → TakeOrderedAndProject
  5. self-match removal (score > 0) and same-parent exclusion
     (service/DocProcAiService.py:616-637)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_distance


def union_segments(
    document_segments: DataFrame,
    video_segments: DataFrame,
    assessment_segments: DataFrame,
) -> DataFrame:
    """Outer-union of heterogeneous segment schemas with source tags."""
    d = document_segments.withColumn("source", F.lit("document"))
    v = video_segments.withColumn("source", F.lit("video"))
    a = assessment_segments.withColumn("source", F.lit("assessment"))
    return d.unionByName(v, allowMissingColumns=True).unionByName(a, allowMissingColumns=True)


def semantic_search(
    segments: DataFrame,
    query_vec: list[float],
    k: int = 10,
    whitelist: list[str] | None = None,
    exclude_parent: str | None = None,
    vec_col: str = "embedding",
    parent_col: str = "parent_id",
) -> DataFrame:
    """Top-k segments by cosine distance (lower = closer), reference semantics.

    Filters are applied BEFORE the distance computation so Catalyst pushes
    them into the scan (the reference does this by hand inside each
    sub-select — persistence/SegmentDbConnector.py:235,243,252).
    """
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    out = segments
    if whitelist is not None:
        out = out.filter(F.col(parent_col).isin(whitelist))
    if exclude_parent is not None:
        out = out.filter(F.col(parent_col) != exclude_parent)
    scored = out.withColumn(
        "score", cosine_distance(F.col(vec_col).cast("array<double>"), q)
    ).filter(F.col("score") > 0)  # self-match removal (score == 0 is the query row)
    # per-assessment collapse: best (min) score represents the assessment
    assess = (
        scored.filter(F.col("source") == "assessment")
        .groupBy(parent_col)
        .agg(F.min("score").alias("score"))
        .withColumn("id", F.col(parent_col))
        .withColumn("source", F.lit("assessment"))
    )
    rest = scored.filter(F.col("source") != "assessment").select("id", parent_col, "source", "score")
    return (
        rest.unionByName(assess.select("id", parent_col, "source", "score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )


def segment_link_exists(links: DataFrame, s1: str, s2: str) -> DataFrame:
    """Symmetric link-existence as a canonical-pair equi-filter (not an OR-join),
    replacing reference: persistence/SegmentDbConnector.py:201-221."""
    lo, hi = (s1, s2) if s1 <= s2 else (s2, s1)
    canon = links.select(
        F.least(F.col("segment1_id"), F.col("segment2_id")).alias("lo"),
        F.greatest(F.col("segment1_id"), F.col("segment2_id")).alias("hi"),
    )
    return canon.filter((F.col("lo") == lo) & (F.col("hi") == hi))


def cascade_delete_media_record(
    segments: DataFrame, links: DataFrame, record_id: str
) -> tuple[DataFrame, DataFrame]:
    """Chained anti-joins replacing the reference's multi-statement cascade
    (reference: service/DocProcAiService.py:404-418, DELETE…RETURNING at
    persistence/SegmentDbConnector.py:126-188): returns (segments', links')
    with the record's segments and any links touching them removed — one
    lineage, no per-row round trips, trivially idempotent."""
    victims = segments.filter(F.col("parent_id") == record_id).select("id")
    kept_segments = segments.join(victims, "id", "left_anti")
    kept_links = (
        links.join(victims.withColumnRenamed("id", "segment1_id"), "segment1_id", "left_anti")
        .join(victims.withColumnRenamed("id", "segment2_id"), "segment2_id", "left_anti")
    )
    return kept_segments, kept_links
