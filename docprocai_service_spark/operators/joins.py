"""Skew-aware join utilities (explicit salting + canonical-pair helpers).

The reference never faces skew — it processes one document at a time
(reference: service/DocProcAiService.py:694-707) and delegates every real join
to Postgres. At 100 TB the head entities (Wikipedia/Wikidata-hub analogs;
Zipf-distributed in the corpus) dominate join keys, so the north_rule demands
explicit handling: Catalyst/AQE will split skewed *shuffle* partitions, but it
will NOT replicate a dimension table for you — that is what `salted_join`
does. AQE skew-join stays enabled as the backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, salted to defuse hot keys.

    big gets salt = pmod(xxhash64(salt_on), n_salts) — deterministic, so
    re-runs produce identical partition placement; small is replicated
    n_salts× via explode. Result is row-identical to the unsalted join
    (property-tested), but each hot key's rows now spread over n_salts
    shuffle partitions.
    """
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str,
    n_salts: int = 8,
    how: str = "left",
    hot_fraction: float = 0.25,
    probe_rows: int = 100_000,
) -> DataFrame:
    """`salted_join` with the published ablation encoded as a guardrail.

    The skew ablation (BENCH/BASELINE.md, round 3) measured salting as a
    2.32× WIN when one hub key carries ~50% of the stream but a 0.69× LOSS
    at mild Zipf skew (the n_salts× dimension replication costs more than
    the imbalance it removes when no reducer saturates). This wrapper makes
    that lesson structural: a bounded probe (first `probe_rows` rows — one
    partial scan, never a full pass) estimates the hottest key's share; only
    when it exceeds `hot_fraction` does the join salt, otherwise it stays
    plain. Output is row-identical either way (property-tested), so the
    probe affects only the physical plan.

    At 100 TB the probe cost is a single task reading the first input
    split(s); the hub regime it detects (a Wikipedia/Wikidata-style head
    entity funneling a constant fraction of ALL rows to one reducer) is
    visible in any prefix by definition.
    """
    counts = (
        big.select(F.col(key).alias("__k"))
        .limit(probe_rows)
        .groupBy("__k")
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .first()
    )
    total = counts["total"] or 0
    if total > 0 and counts["top"] / total > hot_fraction:
        return salted_join(big, small, key=key, salt_on=salt_on, n_salts=n_salts, how=how)
    return big.join(small, key, how)


def canonical_pair(c1: Column, c2: Column) -> tuple[Column, Column]:
    """Order-free edge representation (least, greatest).

    Replaces the reference's symmetric OR-predicate link-exists check
    (reference: persistence/SegmentDbConnector.py:201-221) with a canonical
    form so existence checks become plain equi-joins — an OR-join would defeat
    hash partitioning.
    """
    return F.least(c1, c2), F.greatest(c1, c2)


def anti_join_on_keys(df: DataFrame, done: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of df whose key tuple is NOT in done (resume / existence filter).

    Spark plans a left-anti hash join; with AQE the small `done` side is
    broadcast. This replaces the reference's per-row existence check before
    insert (reference: service/DocProcAiService.py:360-366).
    """
    return df.join(done.select(*keys).distinct(), keys, "left_anti")
