"""Entity linking: strategy equivalence (salted == broadcast == prereduced),
disambiguation determinism, NIL handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docprocai_service_spark.operators.extract import extract_stage
from docprocai_service_spark.operators.joins import salted_join
from docprocai_service_spark.operators.linking import link_mentions, reduce_alias_dict
from docprocai_service_spark.operators.triples import mentions_stage, triples_stage


@pytest.fixture(scope="module")
def mentions(spark, spark_corpus):
    pages, _ = spark_corpus
    return mentions_stage(triples_stage(extract_stage(pages))).localCheckpoint()


def _links(df):
    return {(r["mention_id"], r["entity_id"]) for r in df.select("mention_id", "entity_id").collect()}


def test_all_strategies_identical(mentions, spark_corpus):
    _, alias = spark_corpus
    a = _links(link_mentions(mentions, alias, "prereduced"))
    b = _links(link_mentions(mentions, alias, "broadcast"))
    c = _links(link_mentions(mentions, alias, "salted", n_salts=4))
    d = _links(link_mentions(mentions, alias, "skew_aware", n_salts=4))
    assert a == b == c == d
    assert len(a) == mentions.count()  # exactly one row per mention


def test_ambiguous_alias_resolves_to_max_prior(mentions, spark_corpus, corpus):
    _, alias = spark_corpus
    linked = link_mentions(mentions, alias, "broadcast")
    # pick an ambiguous short alias (e.g. "acme" maps to many entities)
    amb = (
        corpus.alias_dict.groupby("alias")
        .filter(lambda g: len(g) > 1)
        .sort_values("alias")
    )
    assert len(amb) > 0
    one = amb.iloc[0]["alias"]
    expected = (
        corpus.alias_dict[corpus.alias_dict.alias == one]
        .sort_values(["prior", "entity_id"], ascending=[False, True])
        .iloc[0]["entity_id"]
    )
    got = (
        linked.filter(F.lower(F.col("surface")) == one)
        .select("entity_id")
        .distinct()
        .collect()
    )
    assert [r["entity_id"] for r in got] == [expected]


def test_salted_join_equals_plain_join(spark, spark_corpus):
    _, alias = spark_corpus
    best = reduce_alias_dict(alias)
    probe = alias.select(F.col("alias"), F.sha2(F.col("alias"), 256).alias("uid")).distinct()
    plain = probe.join(best, "alias", "left")
    salted = salted_join(probe, best, key="alias", salt_on="uid", n_salts=5)
    key = lambda df: sorted(map(tuple, df.select("alias", "uid", "entity_id").collect()))
    assert key(plain) == key(salted)


def test_unknown_surface_is_nil(spark, spark_corpus):
    pages, alias = spark_corpus
    from docprocai_service_spark import schemas
    import datetime

    rows = [("zzz-unknown-entity", "https://x", datetime.datetime(2025, 1, 1), 0, "Qwertyzx Blorp", "subj")]
    m = spark.createDataFrame(rows, schema="mention_id string, url string, warc_ts timestamp, sent_no int, surface string, role string")
    linked = link_mentions(m, alias, "prereduced")
    row = linked.collect()[0]
    assert row["entity_id"] is None and row["link_score"] is None
