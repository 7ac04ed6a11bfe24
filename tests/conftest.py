"""Shared fixtures: one SparkSession per test run, one deterministic corpus."""

from __future__ import annotations

import pytest

from docprocai_service_spark.corpus import make_corpus
from docprocai_service_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return make_corpus(n_pages=300, n_entities=400, seed=42)


@pytest.fixture(scope="session")
def spark_corpus(spark, corpus):
    from docprocai_service_spark.corpus import corpus_to_spark

    pages, alias = corpus_to_spark(spark, corpus)
    return pages.localCheckpoint(), alias.localCheckpoint()
