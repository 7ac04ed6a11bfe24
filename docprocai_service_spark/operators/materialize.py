"""Stage 5 — canonical entity/edge table materialization (capability C9).

Replaces the reference's per-row INSERT loops and upserts
(reference: persistence/SegmentDbConnector.py:75-124, one INSERT per segment
from service/DocProcAiService.py:122-130) with batched, partitioned,
idempotent DataFrame writes.

Plan shape for edges: the subj/obj → entity resolution is TWO broadcast joins
against the (pre-reduced, tiny) alias dictionary plus one broadcast join
against the canon mapping — the 100 TB triple stream is never shuffled until
the final groupBy(src, dst, pred), whose keys are entity ids (salting for the
head-entity skew is inherited from AQE + the bucketed layout).

Output layout: partitioned by bucket(NUM_BUCKETS, entity hash) — co-locates
each entity's edges for downstream neighborhood queries and bounds file count
at web scale (a raw partitionBy(entity) would create 10⁸ directories).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .linking import reduce_alias_dict

NUM_BUCKETS = 16


def entity_bucket(col: Column, n: int = NUM_BUCKETS) -> Column:
    """Deterministic bucket id for an entity key (xxhash64 — stable across runs)."""
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def resolve_entities(triples: DataFrame, alias_dict: DataFrame, canon_map: DataFrame) -> DataFrame:
    """triples → (src_entity, dst_entity, pred, url, warc_ts, sent_no).

    Unlinkable surfaces become deterministic NIL entities
    ('NIL:' + sha256(lower(surface))) so unknown-but-identical mentions still
    aggregate — never dropped rows, never random ids.
    """
    best = reduce_alias_dict(alias_dict)
    canon = canon_map.select(
        F.col("entity_id").alias("__eid"), F.col("canon_id").alias("__canon")
    )

    def link_side(df: DataFrame, surface_col: str, out_col: str) -> DataFrame:
        df = df.withColumn("__alias", F.lower(F.col(surface_col)))
        df = df.join(F.broadcast(best.select(F.col("alias").alias("__alias"), "entity_id")), "__alias", "left")
        df = df.join(F.broadcast(canon), df["entity_id"] == canon["__eid"], "left")
        resolved = F.coalesce(
            F.col("__canon"),
            F.col("entity_id"),
            F.concat(F.lit("NIL:"), F.sha2(F.lower(F.col(surface_col)), 256)),
        )
        return df.withColumn(out_col, resolved).drop("__alias", "entity_id", "__eid", "__canon")

    out = link_side(triples, "subj", "src_entity")
    out = link_side(out, "obj", "dst_entity")
    return out.select("src_entity", "dst_entity", "pred", "url", "warc_ts", "sent_no")


def edges_table(resolved: DataFrame) -> DataFrame:
    """Aggregate resolved triples into weighted canonical edges."""
    return (
        resolved.groupBy("src_entity", "dst_entity", "pred")
        .agg(F.count("*").alias("weight"))
        .withColumn("bucket", entity_bucket(F.col("src_entity")))
    )


def entities_table(alias_dict: DataFrame, canon_map: DataFrame) -> DataFrame:
    """Canonical entity registry: id = MIN member id, name = name of that member,
    member_count = #merged entity ids. Order-free reductions only."""
    names = alias_dict.groupBy("entity_id").agg(
        F.max_by("alias", F.length("alias")).alias("name")
    )
    members = canon_map.join(names, "entity_id", "left")
    return (
        members.groupBy(F.col("canon_id").alias("entity_id"))
        .agg(
            F.min_by("name", F.col("entity_id")).alias("canonical_name"),
            F.count("*").alias("member_count"),
        )
        .withColumn("bucket", entity_bucket(F.col("entity_id")))
    )
