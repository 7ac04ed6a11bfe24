"""End-to-end corpus curation plan (plans/curate.py): each planted defect
class is dropped by exactly its stage, the survivors and metrics are exact,
and the exported shards round-trip."""

from __future__ import annotations

import os

import pytest

from docprocai_service_spark.plans.curate import curate_corpus

BENCH_ITEM = (
    "the quick brown fox jumps over the lazy dog and then the fox naps by the river"
)

GOOD = (
    "The committee published the annual report this week and the findings were "
    "clear for all the members who attended the meeting in the town hall. "
    "Several of the proposals will be reviewed by the board in the coming days."
)
GOOD2 = (
    "Researchers at the institute announced the results of the long running "
    "study and the conclusions matched the expectations that the team had "
    "outlined in the earlier papers about the subject of urban transport."
)
NEAR = GOOD[:-5] + " soon."  # same text, last word altered -> near-dup of GOOD
CONTAMINATED = (
    "An introduction paragraph with plenty of ordinary English words to pass "
    f"the quality filters of the pipeline. {BENCH_ITEM} A closing remark with "
    "some more of the usual filler content to keep the length comfortable."
)
JUNK = "!!! ??? *** !!! ??? ***"
GERMAN = (
    "Der Bericht ist und bleibt ein Beispiel und die Mitglieder haben das "
    "Dokument mit von der Kommission und ist das Ergebnis und der Bericht "
    "ist mit dem Rat und das ist ein langer Text mit vielen Worten und der "
    "Text ist ein Beispiel mit der Sprache und das ist der Punkt und mehr."
)


@pytest.fixture(scope="module")
def planted(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, GOOD),          # exact duplicate of 1
            (3, NEAR),          # near-duplicate of 1
            (4, JUNK),          # fails quality
            (5, GERMAN),        # fails language filter
            (6, CONTAMINATED),  # overlaps the benchmark item
            (7, GOOD2),         # clean survivor
        ],
        "doc_id long, text string",
    ).localCheckpoint()
    bench = spark.createDataFrame([(100, BENCH_ITEM)], "bench_id long, text string")
    return docs, bench


def test_each_stage_drops_its_planted_class(spark, planted, tmp_path):
    docs, bench = planted
    out = str(tmp_path / "curated")
    r = curate_corpus(docs, bench, out_dir=out, n_shards=4)
    assert r.metrics == {
        "rows_in": 7,
        "exact_dup_dropped": 1,     # doc 2
        "near_dup_dropped": 1,      # doc 3
        "quality_lang_dropped": 2,  # docs 4, 5
        "contaminated_dropped": 1,  # doc 6
        "rows_out": 2,
    }
    assert sorted(x["doc_id"] for x in r.corpus.select("doc_id").collect()) == [1, 7]
    # export round-trips the survivors and the manifest agrees
    assert r.manifest is not None and r.manifest["total_rows"] == 2
    back = spark.read.parquet(out)
    assert sorted(x["doc_id"] for x in back.select("doc_id").collect()) == [1, 7]
    assert os.path.exists(os.path.join(out, "_EXPORT_SUCCESS"))


def test_no_benchmarks_and_no_export_skips_those_stages(spark, planted):
    docs, _ = planted
    r = curate_corpus(docs)
    assert "contaminated_dropped" not in r.metrics
    assert r.manifest is None
    # doc 6 now SURVIVES (no decontamination requested)
    assert sorted(x["doc_id"] for x in r.corpus.select("doc_id").collect()) == [1, 6, 7]


def test_curation_is_deterministic_across_partitionings(spark, planted):
    docs, bench = planted
    a = curate_corpus(docs, bench)
    b = curate_corpus(docs.repartition(7), bench)
    assert a.metrics == b.metrics
    assert sorted(map(tuple, a.corpus.collect())) == sorted(map(tuple, b.corpus.collect()))


def test_mixture_stage_applies_recipe(spark, planted):
    docs, bench = planted
    # survivors without mixing are docs 1 and 7 (src column absent -> add one)
    import pyspark.sql.functions as F

    docs2 = docs.withColumn(
        "source", F.when(F.col("doc_id") == 7, "tail").otherwise("head")
    )
    r = curate_corpus(docs2, bench, mixture_rates={"tail": 0.0})
    # tail stratum dropped entirely; head stratum (default 1.0) kept
    assert r.metrics["mixture_dropped"] == 1
    assert [x["doc_id"] for x in r.corpus.select("doc_id").collect()] == [1]
