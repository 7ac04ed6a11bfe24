"""Deterministic corpus sampling — the data-MIXING pass of a training
pipeline: downsample each stratum (domain, source, language, quality band)
to a target rate so the final mixture matches the recipe, reproducibly.

`df.sample(fraction)` is wrong for this job twice over: its Bernoulli draw
is seeded per PARTITION (a repartition or resume changes which rows
survive), and it cannot vary the rate per group without N filtered unions.
The operator below keys the draw on the ROW ID instead: a row survives iff
md5_frac(id) < rate(group) — a pure function of (id, recipe), so re-runs,
resumes, different partitionings, and even different ENGINES agree row for
row (the same first-8-hex-digits arithmetic as
operators/materialize.shard_assignment, so DuckDB reproduces the exact
survivor set; pinned by tests/test_sampling.py's side-by-side oracle).

Scale shape: one broadcast join against the dimension-sized recipe + one
codegen scalar compare — no shuffle, no sort, single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_frac(id_col: Column) -> Column:
    """Uniform [0, 1) hash fraction of an id: first 32 bits of
    md5(id-as-string) / 2^32. Engine-portable (DuckDB:
    CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,8) AS BIGINT)/4294967296.0)
    and independent of shard_assignment's modulus, so sampling then
    sharding does not correlate strata with shards beyond the 2^-32 grain."""
    h32 = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return h32.cast("long") / F.lit(float(1 << 32))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each `group_col` stratum at its recipe rate, deterministically.

    rates: {group_value: keep_fraction in [0, 1]}. Groups absent from the
    recipe keep `default_rate` (0.0 = drop unknown strata — the safe
    default for a mixture recipe; pass 1.0 to pass them through).

    The recipe becomes a broadcast dimension; survival is
    md5_frac(id) < rate, so each stratum's realized rate converges to the
    recipe at O(1/sqrt(k)) for a k-row stratum, and the SAME ids survive
    under any partitioning/resume — the property a resumable 100 TB
    mixture job needs (a per-partition-seeded sample() re-draws on every
    topology change). Rows are validated driver-side: a rate outside
    [0, 1] raises rather than silently clamping.
    """
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    if "__rate" in df.columns:
        # ADVICE r6: a pre-existing __rate column would collide with the
        # recipe join's internal column and silently bind the filter/drop to
        # the wrong one — fail fast instead.
        raise ValueError("input df already has a '__rate' column")
    spark = df.sparkSession
    recipe = spark.createDataFrame(
        [(g, float(r)) for g, r in sorted(rates.items())],
        f"{group_col} string, __rate double",
    )
    return (
        df.join(F.broadcast(recipe), group_col, "left")
        .filter(md5_frac(F.col(id_col)) < F.coalesce(F.col("__rate"), F.lit(float(default_rate))))
        .drop("__rate")
    )


def mixture_report(
    df: DataFrame, sampled: DataFrame, group_col: str = "source"
) -> DataFrame:
    """(group, rows_in, rows_kept, realized_rate) — the audit table a
    mixture job materializes next to its output. Two hash aggs."""
    a = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("rows_in"))
    b = sampled.groupBy(group_col).agg(F.count(F.lit(1)).alias("rows_kept"))
    return (
        a.join(b, group_col, "left")
        .select(
            group_col,
            "rows_in",
            F.coalesce("rows_kept", F.lit(0)).alias("rows_kept"),
            F.round(F.coalesce("rows_kept", F.lit(0)) / F.col("rows_in"), 4).alias(
                "realized_rate"
            ),
        )
    )
