"""Vector math over ArrayType(Float) columns — pure JVM expressions.

The reference computes cosine distance inside Postgres via pgvector's `<=>`
operator (reference: persistence/SegmentDbConnector.py:233) with no vector
index anywhere (exact KNN by sequential scan). Here the same exact semantics
run as higher-order functions (zip_with/aggregate) inside whole-stage codegen:
embarrassingly parallel, no UDF, no Python.

Plain arrays (not MLlib VectorUDT) keep the Arrow fast path for the pandas-UDF
operators that consume the same columns (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """pgvector `<=>` equivalent (1 - cosine similarity)."""
    return F.lit(1.0) - cosine_similarity(a, b)
