"""Every table schema, declared exactly once (SURVEY.md §1.3).

The reference declares each schema twice — Postgres DDL
(reference: persistence/SegmentDbConnector.py:25-73) and Python entity classes
(reference: persistence/entities.py:17-73) — reconciled by hand-written
mappers. Here a single StructType per table is the source of truth; nothing is
ever inferred, so golden tests are stable across machines and partitionings.

Vectors are ArrayType(FloatType()) — plain arrays keep the Arrow fast path for
pandas UDFs (not MLlib VectorUDT). Ids are deterministic sha256 hex strings,
never UUIDs: the reference's `gen_random_uuid()` default
(reference: persistence/SegmentDbConnector.py:28) would break resumability and
golden tests, a documented divergence (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input
# Common-Crawl-style web pages; key = (url, warc_ts).
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),  # filled by extract stage
        T.StructField("lang", T.StringType(), False),
    ]
)

# Broadcast entity-linking dimension (FIXTURES.md F2).
ALIAS_DICT = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)

# ---------------------------------------------------------------- stages
EXTRACTED_TEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# One row per sentence-level mention; mention_id = sha256(url|warc_ts|sent_no|span).
MENTIONS = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("sent_no", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("role", T.StringType(), False),  # 'subj' | 'obj'
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("sent_no", T.IntegerType(), False),
    ]
)

LINKED_MENTIONS = T.StructType(
    MENTIONS.fields
    + [
        T.StructField("entity_id", T.StringType(), True),  # null = NIL mention
        T.StructField("link_score", T.DoubleType(), True),
    ]
)

ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),  # canonical: min id in component
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("member_count", T.LongType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_entity", T.StringType(), False),
        T.StructField("dst_entity", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("weight", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_keys_hash", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# --------------------------------------------------- reference-shaped tables
# The heterogeneous segment union the reference models as three tables plus a
# NATURAL FULL JOIN schema-union device
# (reference: persistence/SegmentDbConnector.py:292-309) is one DataFrame with
# a `source` discriminator and nullable per-source fields.
SEGMENTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), False),  # media_record / assessment id
        T.StructField("source", T.StringType(), False),  # document | video | assessment
        T.StructField("text", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),  # document only
        T.StructField("start_time", T.IntegerType(), True),  # video only
        T.StructField("transcript", T.StringType(), True),  # video only
        T.StructField("title", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

# Edge table between segments (reference: persistence/SegmentDbConnector.py:66-73).
SEGMENT_LINKS = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("segment1_id", T.StringType(), False),
        T.StructField("segment2_id", T.StringType(), False),
    ]
)

# Ingestion state machine (reference: persistence/IngestionStateDbConnector.py:18-55).
INGESTION_STATES = ("ENQUEUED", "PROCESSING", "DONE")
INGESTION_STATE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
    ]
)
