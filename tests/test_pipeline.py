"""End-to-end pipeline: goldens, resume correctness, kill-and-resume, lineage."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from docprocai_service_spark.plans.pipeline import run_pipeline
from docprocai_service_spark.sources.manifest import StageStore
from docprocai_service_spark.streaming.incremental import incremental_ingest


def _edges_key(df):
    return sorted(map(tuple, df.select("src_entity", "dst_entity", "pred", "weight").collect()))


@pytest.fixture(scope="module")
def pipe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def first_run(spark, spark_corpus, pipe_dir):
    """Eagerly collected snapshot — later runs overwrite the stage parquet, so
    lazily-held DataFrames from this run would see stale file listings."""
    pages, alias = spark_corpus
    r = run_pipeline(spark, pages, alias, out_dir=pipe_dir)
    return {
        "metrics": r.metrics,
        "edges_key": _edges_key(r.edges),
        "n_edges": r.edges.count(),
        "n_entities": r.entities.count(),
        "lineage_stages": {x["stage"] for x in r.lineage.select("stage").distinct().collect()},
        "lineage_bad": r.lineage.filter(F.col("rows_out") < 0).count(),
    }


def test_pipeline_produces_output(first_run):
    assert first_run["metrics"]["n_triples"] > 1000
    assert first_run["n_edges"] > 0
    assert first_run["n_entities"] > 0


def test_resume_is_byte_identical_and_skips_stages(spark, spark_corpus, pipe_dir, first_run):
    pages, alias = spark_corpus
    r2 = run_pipeline(spark, pages, alias, out_dir=pipe_dir)
    assert all(r2.metrics.get(f"{s}_resumed") for s in ["extracted", "triples", "mentions", "linked", "canon_map", "edges", "entities"])
    assert first_run["edges_key"] == _edges_key(r2.edges)


def test_kill_and_resume_reruns_only_missing_stage(spark, spark_corpus, pipe_dir, first_run):
    """FIXTURES.md F6: delete one stage manifest → only that stage (and its
    dependents) recompute; outputs converge to identical rows."""
    pages, alias = spark_corpus
    store = StageStore(spark, pipe_dir)
    store.invalidate("canon_map")  # simulates torn write (no _SUCCESS)
    assert not store.is_done("canon_map")
    r3 = run_pipeline(spark, pages, alias, out_dir=pipe_dir)
    assert r3.metrics.get("extracted_resumed")  # upstream untouched
    assert "canon_map_resumed" not in r3.metrics  # recomputed
    assert first_run["edges_key"] == _edges_key(r3.edges)


def test_lineage_rows_cover_all_stages(first_run):
    assert {"extracted", "triples", "mentions", "linked", "canon_map", "edges", "entities"} <= first_run["lineage_stages"]
    assert first_run["lineage_bad"] == 0


def test_out_neighborhood_matches_driver_bfs(spark, pipe_dir, first_run):
    """Point query over the materialized bucket-partitioned edges table must
    equal a driver-side BFS over the full edge list: same edge set, same
    first-reached hop attribution, each src expanded exactly once."""
    import os

    from docprocai_service_spark.operators.materialize import out_neighborhood

    edges_path = os.path.join(pipe_dir, "edges")
    rows = spark.read.parquet(edges_path).select(
        "src_entity", "dst_entity", "pred", "weight"
    ).collect()
    adj: dict[str, list] = {}
    for r in rows:
        adj.setdefault(r.src_entity, []).append(r)
    # seeds with real out-degree so two hops exercise the frontier loop
    seeds = sorted(adj)[:3]

    expected: dict[tuple, tuple] = {}
    frontier, visited = set(seeds), set()
    for hop in (1, 2):
        nxt: set[str] = set()
        for s in frontier:
            for e in adj.get(s, []):
                expected[(e.src_entity, e.dst_entity, e.pred)] = (e.weight, hop)
                nxt.add(e.dst_entity)
        visited |= frontier
        frontier = nxt - visited

    got = out_neighborhood(spark, edges_path, seeds, hops=2)
    got_rows = {
        (r.src_entity, r.dst_entity, r.pred): (r.weight, r.hop) for r in got.collect()
    }
    assert got_rows == expected
    assert got.count() == len(got_rows)  # no duplicate edges across hops


def test_in_neighborhood_reverse_bfs_over_dst_twin(spark, pipe_dir, first_run, tmp_path):
    """Reverse point query: materialize the dst-bucketed twin once, then an
    in-neighborhood walk must equal a driver BFS over reversed edges."""
    import os

    from docprocai_service_spark.operators.materialize import (
        in_neighborhood,
        write_edges_by_dst,
    )

    edges_path = os.path.join(pipe_dir, "edges")
    twin_path = str(tmp_path / "edges_by_dst")
    write_edges_by_dst(spark.read.parquet(edges_path), twin_path)

    rows = spark.read.parquet(edges_path).select(
        "src_entity", "dst_entity", "pred", "weight"
    ).collect()
    radj: dict[str, list] = {}
    for r in rows:
        radj.setdefault(r.dst_entity, []).append(r)
    seeds = sorted(radj)[:3]

    expected: dict[tuple, tuple] = {}
    frontier, visited = set(seeds), set()
    for hop in (1, 2):
        nxt: set[str] = set()
        for s in frontier:
            for e in radj.get(s, []):
                expected[(e.src_entity, e.dst_entity, e.pred)] = (e.weight, hop)
                nxt.add(e.src_entity)
        visited |= frontier
        frontier = nxt - visited

    got = in_neighborhood(spark, twin_path, seeds, hops=2)
    got_rows = {
        (r.src_entity, r.dst_entity, r.pred): (r.weight, r.hop) for r in got.collect()
    }
    assert got_rows == expected
    # the twin holds the same edge multiset as the source table
    assert spark.read.parquet(twin_path).count() == len(rows)


def test_out_neighborhood_guards_and_empty(spark, pipe_dir, first_run):
    import os

    import pytest as _pytest

    from docprocai_service_spark.operators.materialize import out_neighborhood

    edges_path = os.path.join(pipe_dir, "edges")
    empty = out_neighborhood(spark, edges_path, [], hops=3)
    assert empty.count() == 0
    assert empty.columns == ["src_entity", "dst_entity", "pred", "weight", "hop"]
    with _pytest.raises(ValueError, match="max_frontier"):
        out_neighborhood(spark, edges_path, ["a", "b", "c"], hops=1, max_frontier=2)


def test_incremental_ingest_appends_only_new_keys(spark, spark_corpus, tmp_path):
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "inc"))
    first = pages.limit(120).localCheckpoint()
    m1 = incremental_ingest(spark, first, store)
    assert m1["new_pages"] == 120
    # redelivery: at-least-once duplicates are no-ops
    m2 = incremental_ingest(spark, first, store)
    assert m2["new_pages"] == 0
    m3 = incremental_ingest(spark, pages, store)
    assert m3["new_pages"] == pages.count() - 120
    # final state equals a fresh batch run over everything
    from docprocai_service_spark.operators.extract import extract_stage
    from docprocai_service_spark.operators.triples import triples_stage

    cols = ["subj", "pred", "obj", "url", "warc_ts", "sent_no"]
    want = sorted(map(tuple, triples_stage(extract_stage(pages)).select(*cols).collect()))
    got = sorted(map(tuple, store.read("triples").select(*cols).collect()))
    assert got == want


def test_incremental_full_dag_matches_batch(spark, spark_corpus, tmp_path):
    """VERDICT r2 #2: two successive micro-batches through the FULL DAG
    (extract → … → linked → canon → additive edge merge → entities) must
    equal one full-batch run — identical edge rows, linked rows, entities."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "incfull"))
    b1 = pages.limit(120).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    m1 = incremental_ingest(spark, b1, store, alias_dict=alias)
    m2 = incremental_ingest(spark, b2, store, alias_dict=alias)
    # only pages that actually emit triples enter the edge ledger — empty
    # pages have nothing to contribute (and nothing to replay)
    assert 0 < m1["merged_edge_pages"] <= 120
    assert m1["new_pages"] + m2["new_pages"] == pages.count()
    # redelivery of the whole corpus after completion: full no-op
    m3 = incremental_ingest(spark, pages, store, alias_dict=alias)
    assert m3 == {"new_pages": 0}

    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    want_ent = sorted(map(tuple, full.entities.collect()))
    got_ent = sorted(map(tuple, store.read("entities").select(*full.entities.columns).collect()))
    assert got_ent == want_ent
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_incremental_edge_merge_is_additive_and_ledgered(spark, spark_corpus, tmp_path):
    """A page whose triples were already merged must not contribute twice —
    the edges_pages ledger anti-joins it away on redelivery."""
    from docprocai_service_spark.streaming.incremental import merge_edge_deltas

    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "ledger"))
    b1 = pages.limit(80).localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)
    key1 = _edges_key(store.read("edges"))
    # calling the merge again with nothing new: zero pages, identical edges
    assert merge_edge_deltas(store, alias, store.read("canon_map")) == 0
    assert _edges_key(store.read("edges")) == key1


def test_incremental_crash_between_stages_recovers(spark, spark_corpus, tmp_path):
    """At-least-once across a crash AFTER the triples append but BEFORE the
    mentions/extracted appends: the retry must still see the pages as todo
    (the 'extracted' ledger commits last) and converge with no duplicates."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "crash"))
    batch = pages.limit(60).localCheckpoint()

    real_append = StageStore.append_new

    def crashing_append(self, stage, df, keys):
        if stage == "mentions":
            raise RuntimeError("simulated crash between stage commits")
        return real_append(self, stage, df, keys=keys)

    StageStore.append_new = crashing_append
    try:
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, batch, store)
    finally:
        StageStore.append_new = real_append

    # triples committed, but the ledger did not — retry must re-process
    assert store.is_done("triples")
    assert not store.is_done("extracted")
    m = incremental_ingest(spark, batch, store)
    assert m["new_pages"] == 60  # NOT silently skipped
    # no duplicate triples, and every downstream stage completed
    from docprocai_service_spark.operators.extract import extract_stage
    from docprocai_service_spark.operators.triples import triples_stage

    cols = ["subj", "pred", "obj", "url", "warc_ts", "sent_no"]
    want = sorted(map(tuple, triples_stage(extract_stage(batch)).select(*cols).collect()))
    got = sorted(map(tuple, store.read("triples").select(*cols).collect()))
    assert got == want
    assert store.is_done("mentions") and store.is_done("extracted")
    # re-delivery after full recovery is a no-op
    assert incremental_ingest(spark, batch, store)["new_pages"] == 0


def test_recompute_invalidates_downstream_stages(spark, spark_corpus, tmp_path):
    """ADVICE: a stage overwrite must invalidate downstream manifests so a
    crash between stage overwrites cannot resume stale later stages."""
    pages, alias = spark_corpus
    d = str(tmp_path / "inval")
    r1 = run_pipeline(spark, pages, alias, out_dir=d)
    key1 = _edges_key(r1.edges)  # collect eagerly: r2 overwrites the files
    store = StageStore(spark, d)
    # torn write upstream: triples missing, downstream manifests still present
    store.invalidate("triples")
    r2 = run_pipeline(spark, pages, alias, out_dir=d)
    # triples recomputed — and NOTHING downstream of it resumed stale output
    for s in ["triples", "mentions", "linked", "canon_map", "edges", "entities"]:
        assert f"{s}_resumed" not in r2.metrics, s
    assert r2.metrics.get("extracted_resumed")
    assert key1 == _edges_key(r2.edges)


def test_streaming_ingest_available_now(spark, spark_corpus, tmp_path):
    from docprocai_service_spark.streaming.incremental import streaming_ingest

    pages, _ = spark_corpus
    in_dir = str(tmp_path / "in")
    pages.limit(50).write.mode("overwrite").parquet(in_dir)
    store = StageStore(spark, str(tmp_path / "stream_out"))
    streaming_ingest(spark, in_dir, store, str(tmp_path / "ckpt"))
    assert store.read("extracted").count() == 50
    # drop more files; a second availableNow run picks up only the new ones
    pages.limit(80).write.mode("append").parquet(in_dir)
    streaming_ingest(spark, in_dir, store, str(tmp_path / "ckpt"))
    assert store.read("extracted").select("url", "warc_ts").distinct().count() == 80


def test_streaming_features_arm_matches_batch_twin(spark, spark_corpus, tmp_path):
    """VERDICT r5 #5: streaming_ingest(features=True) must converge the
    per-entity graph-feature table after every micro-batch — post-stream it
    equals the same pagerank+LPA chain computed over a one-shot batch run
    of ALL pages (kg_features_docs' operator composition)."""
    from docprocai_service_spark.operators.graph import label_propagation, pagerank_fixed
    from docprocai_service_spark.streaming.incremental import streaming_ingest

    pages, alias = spark_corpus
    in_dir = str(tmp_path / "in")
    pages.limit(120).write.mode("overwrite").parquet(in_dir)
    store = StageStore(spark, str(tmp_path / "stream_feat"))
    ckpt = str(tmp_path / "ckpt")
    streaming_ingest(spark, in_dir, store, ckpt, alias_dict=alias, features=True)
    assert store.is_done("graph_features")
    # second micro-batch: remaining pages (overlap dedupes by key)
    pages.write.mode("append").parquet(in_dir)
    streaming_ingest(spark, in_dir, store, ckpt, alias_dict=alias, features=True)

    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    e = full.edges.select(
        F.col("src_entity").alias("src"), F.col("dst_entity").alias("dst"), "weight"
    ).localCheckpoint()
    ranks = pagerank_fixed(e, iters=6, checkpoint_every=3, weight_col="weight")
    comms = label_propagation(e, iters=4, weight_col="weight")
    want = {
        r["id"]: (r["rank"], r["community"])
        for r in ranks.join(comms, "id", "left")
        .select("id", "rank", F.coalesce("label", F.col("id")).alias("community"))
        .collect()
    }
    got = {
        r["entity_id"]: (r["rank"], r["community"])
        for r in store.read("graph_features").collect()
    }
    assert got == want
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_incremental_onto_batch_store_bootstraps_ledger(spark, spark_corpus, tmp_path):
    """Incremental ingest onto a store built by a BATCH run must not re-merge
    the batch pages' edge weights (the ledger bootstraps from the committed
    triples stage before the first micro-batch appends)."""
    from docprocai_service_spark.operators.extract import extract_stage
    from docprocai_service_spark.operators.triples import triples_stage

    pages, alias = spark_corpus
    d = str(tmp_path / "handoff")
    b1 = pages.limit(200).localCheckpoint()
    run_pipeline(spark, b1, alias, out_dir=d)  # batch run writes edges, no ledger
    store = StageStore(spark, d)
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b2, store, alias_dict=alias)
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_edge_merge_crash_before_ledger_commit_converges(spark, spark_corpus, tmp_path):
    """VERDICT r3 #3: a crash BETWEEN the edge upsert and the edges_pages
    ledger commit used to double-count the in-flight pages' weights on
    replay. The merge-intent record (edges.merge.json) closes the window:
    the retry recognizes the committed upsert by its delta fingerprint and
    only finishes the ledger commit."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "intent1"))
    b1 = pages.limit(120).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)

    real_append = StageStore.append_new
    crashed = {"n": 0}

    def crashing_append(self, stage, df, keys):
        if stage == "edges_pages" and crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("simulated crash after edge upsert, before ledger commit")
        return real_append(self, stage, df, keys=keys)

    StageStore.append_new = crashing_append
    try:
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, b2, store, alias_dict=alias)
    finally:
        StageStore.append_new = real_append

    # retry converges — previously this re-added b2's weights (double-count)
    incremental_ingest(spark, b2, store, alias_dict=alias)
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_edge_merge_crash_during_upsert_repairs_exactly(spark, spark_corpus, tmp_path):
    """A crash while the edge upsert itself is in flight (intent still
    'begin') is ambiguous — the retry must route to the exact rebuild, not
    an additive merge over possibly-partially-merged buckets."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "intent2"))
    b1 = pages.limit(120).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)

    real_upsert = StageStore.upsert
    crashed = {"n": 0}

    def crashing_upsert(self, stage, df, keys=None, n_buckets=64):
        if stage == "edges" and crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("simulated crash mid-upsert")
        return real_upsert(self, stage, df, keys=keys, n_buckets=n_buckets)

    StageStore.upsert = crashing_upsert
    try:
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, b2, store, alias_dict=alias)
    finally:
        StageStore.upsert = real_upsert

    import json
    import os

    with open(os.path.join(store.root, "edges.merge.json")) as f:
        assert json.load(f)["state"] == "begin"  # ambiguous state recorded
    incremental_ingest(spark, b2, store, alias_dict=alias)
    assert not os.path.exists(os.path.join(store.root, "edges.merge.json"))
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_ingest_only_batches_then_full_dag_merges_their_pages(spark, spark_corpus, tmp_path):
    """ADVICE r3 #1 (generalized): an ingest-only micro-batch (alias_dict
    absent) appending triples to a store with committed edges must bootstrap
    the ledger FIRST, so a later full-DAG batch merges those pages instead
    of treating them as already-merged."""
    pages, alias = spark_corpus
    d = str(tmp_path / "mixed")
    b1 = pages.limit(150).localCheckpoint()
    rest = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    b2 = rest.limit(100).localCheckpoint()
    b3 = rest.join(b2.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    run_pipeline(spark, b1, alias, out_dir=d)  # batch store: edges, no ledger
    store = StageStore(spark, d)
    incremental_ingest(spark, b2, store)  # ingest-only: no linking/merge
    incremental_ingest(spark, b3, store, alias_dict=alias)  # full DAG
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_alias_dict_change_triggers_exact_refresh(spark, spark_corpus, tmp_path):
    """VERDICT r3 #4: the canon_map manifest carries a fingerprint of the
    alias dictionary it derives from; a changed dictionary on a later
    micro-batch must auto-invalidate and produce edges/linked/entities
    identical to a fresh batch run with the NEW dictionary."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "dictchange"))
    b1 = pages.limit(150).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)

    # drop the ambiguous short aliases -> linking and canon groupings change
    alias2 = alias.filter(F.length("alias") > 6).localCheckpoint()
    m = incremental_ingest(spark, b2, store, alias_dict=alias2)
    assert m.get("rebuilt_for_dict_change")

    full = run_pipeline(spark, pages, alias2, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    # unchanged dictionary on the next batch: no rebuild
    m2 = incremental_ingest(spark, pages, store, alias_dict=alias2)
    assert m2 == {"new_pages": 0}
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_edge_merge_double_crash_converges_via_rebuild(spark, spark_corpus, tmp_path):
    """Crash during the merge upsert AND again during the repair rebuild's
    upsert: the intent record survives both, so the second retry rebuilds
    exactly — no state is ever half-trusted."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "intent3"))
    b1 = pages.limit(120).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)

    real_upsert = StageStore.upsert
    crashes = {"n": 0}

    def crashing_upsert(self, stage, df, keys=None, n_buckets=64):
        if stage == "edges" and crashes["n"] < 2:
            crashes["n"] += 1
            raise RuntimeError(f"simulated crash #{crashes['n']}")
        return real_upsert(self, stage, df, keys=keys, n_buckets=n_buckets)

    StageStore.upsert = crashing_upsert
    try:
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, b2, store, alias_dict=alias)  # merge crash
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, b2, store, alias_dict=alias)  # rebuild crash
    finally:
        StageStore.upsert = real_upsert
    assert crashes["n"] == 2
    incremental_ingest(spark, b2, store, alias_dict=alias)
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_dict_change_crash_mid_refresh_repairs_exactly(spark, spark_corpus, tmp_path):
    """ADVICE r4 (high): a crash AFTER the new canon_map commits but BEFORE
    the linked/edges refresh completes must NOT replay as a normal delta
    merge — the refresh-complete stamp (alias_fp, annotated last) is still
    missing, so the retry routes back into the exact relink + rebuild."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "refreshcrash"))
    b1 = pages.limit(150).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)

    alias2 = alias.filter(F.length("alias") > 6).localCheckpoint()
    real_write = StageStore.write
    crashed = {"n": 0}

    def crashing_write(self, stage, df, partition_by=None, meta=None):
        if stage == "linked" and crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("simulated crash between canon_map commit and refresh")
        return real_write(self, stage, df, partition_by=partition_by, meta=meta)

    StageStore.write = crashing_write
    try:
        with pytest.raises(RuntimeError):
            incremental_ingest(spark, b2, store, alias_dict=alias2)
    finally:
        StageStore.write = real_write

    # canon_map committed with only the PENDING stamp — downstream is suspect
    man = store.manifest("canon_map")
    assert man.get("alias_fp") != man.get("alias_fp_pending")

    m = incremental_ingest(spark, b2, store, alias_dict=alias2)
    assert m.get("rebuilt_for_dict_change")  # repaired, not silently merged
    full = run_pipeline(spark, pages, alias2, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_torn_linked_write_rebuilds_all_prior_links(spark, spark_corpus, tmp_path):
    """ADVICE r4 (high, second arm): if the linked stage's write was torn
    (stage not done), the next batch must rebuild it from the FULL mentions
    stage — append_new on a not-done stage would overwrite it with only the
    current batch's links, permanently dropping all prior rows."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "tornlinked"))
    b1 = pages.limit(150).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)
    store.invalidate("linked")  # torn write: data present, no _SUCCESS/manifest
    incremental_ingest(spark, b2, store, alias_dict=alias)
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_dict_change_detected_on_empty_batch(spark, spark_corpus, tmp_path):
    """A dictionary-only update (no new pages in the micro-batch) must still
    be detected and refreshed — the fingerprint check runs even when the
    batch itself is empty."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "emptydict"))
    incremental_ingest(spark, pages, store, alias_dict=alias)
    alias2 = alias.filter(F.length("alias") > 6).localCheckpoint()
    m = incremental_ingest(spark, pages.limit(0), store, alias_dict=alias2)
    assert m["new_pages"] == 0 and m.get("rebuilt_for_dict_change")
    full = run_pipeline(spark, pages, alias2, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    # consistent store + unchanged dict + empty batch: exact no-op
    assert incremental_ingest(spark, pages.limit(0), store, alias_dict=alias2) == {"new_pages": 0}
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_legacy_store_adoption_verifies_dictionary(spark, spark_corpus, tmp_path):
    """ADVICE r5: a legacy canon_map (neither alias_fp nor alias_fp_pending —
    pre-fingerprint batch runs) must be adopted by EVIDENCE: touched with the
    SAME dictionary its content derives from it stamps consistent and merges
    normally; touched with a DIFFERENT dictionary it must route into the
    exact refresh instead of silently merging stale links/edges."""
    import json
    import os

    pages, alias = spark_corpus

    def strip_stamps(store):
        p = store._manifest_path("canon_map")
        man = json.load(open(p))
        man.pop("alias_fp", None)
        man.pop("alias_fp_pending", None)
        tmp = p + ".tmp"
        json.dump(man, open(tmp, "w"))
        os.replace(tmp, p)

    # same dictionary: adoption stamps consistent, no rebuild
    s1 = StageStore(spark, str(tmp_path / "legacy_same"))
    incremental_ingest(spark, pages, s1, alias_dict=alias)
    strip_stamps(s1)
    m = incremental_ingest(spark, pages.limit(0), s1, alias_dict=alias)
    assert not m.get("rebuilt_for_dict_change")
    assert "alias_fp" in s1.manifest("canon_map")

    # different dictionary: content mismatch -> exact refresh, converging to
    # the full pipeline under the NEW dictionary
    s2 = StageStore(spark, str(tmp_path / "legacy_diff"))
    incremental_ingest(spark, pages, s2, alias_dict=alias)
    strip_stamps(s2)
    alias2 = alias.filter(F.length("alias") > 6).localCheckpoint()
    m2 = incremental_ingest(spark, pages.limit(0), s2, alias_dict=alias2)
    assert m2.get("rebuilt_for_dict_change")
    full = run_pipeline(spark, pages, alias2, out_dir=None, collect_lineage=False)
    assert _edges_key(s2.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def _install_crash(plan):
    """Wrap every StageStore mutation so the plan.n-th call raises BEFORE
    executing — sweeping n over all calls visits every between-mutation
    crash point of a batch. Returns the originals for restore."""
    mutators = ["write", "append_new", "upsert", "annotate"]
    originals = {name: getattr(StageStore, name) for name in mutators}

    def make(real):
        def wrapper(self, *a, **k):
            plan["count"] += 1
            if plan["count"] == plan["n"]:
                raise RuntimeError(f"injected crash at mutation {plan['n']}")
            return real(self, *a, **k)
        return wrapper

    for name, real in originals.items():
        setattr(StageStore, name, make(real))
    return originals


def _restore(originals):
    for name, real in originals.items():
        setattr(StageStore, name, real)


@pytest.mark.parametrize("dict_change", [False, True])
def test_every_crash_point_converges(spark, spark_corpus, tmp_path, dict_change):
    """Mechanical proof of the 'exact under every crash schedule' claim:
    for EVERY store-mutation index n of a full-DAG second micro-batch
    (including the dictionary-change refresh schedule), crash at n, retry
    to completion, and require edges + linked to equal a fresh batch run.
    Targeted tests pin the interesting windows; this sweep guarantees no
    window was missed."""
    import shutil as _sh

    pages, alias = spark_corpus
    b1 = pages.limit(150).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    alias2 = alias.filter(F.length("alias") > 6).localCheckpoint() if dict_change else alias
    base = str(tmp_path / "base")
    incremental_ingest(spark, b1, StageStore(spark, base), alias_dict=alias)

    # expected end state: one fresh batch over everything with the final dict
    full = run_pipeline(spark, pages, alias2, out_dir=None, collect_lineage=False)
    want_edges = _edges_key(full.edges)
    want_linked = sorted(map(tuple, full.linked.collect()))
    linked_cols = full.linked.columns
    full.triples.unpersist()
    full.canon_map.unpersist()

    # count the mutations of an un-crashed batch-2 (n=0 never fires)
    probe_dir = str(tmp_path / "probe")
    _sh.copytree(base, probe_dir)
    plan = {"n": 0, "count": 0}
    originals = _install_crash(plan)
    try:
        incremental_ingest(spark, b2, StageStore(spark, probe_dir), alias_dict=alias2)
    finally:
        _restore(originals)
    total = plan["count"]
    assert total >= 6, total

    for n in range(1, total + 1):
        d = str(tmp_path / f"crash{n}")
        _sh.copytree(base, d)
        store = StageStore(spark, d)
        plan = {"n": n, "count": 0}
        originals = _install_crash(plan)
        try:
            with pytest.raises(RuntimeError):
                incremental_ingest(spark, b2, store, alias_dict=alias2)
        finally:
            _restore(originals)
        # retry (at-least-once redelivery) — must fully converge
        incremental_ingest(spark, b2, store, alias_dict=alias2)
        assert _edges_key(store.read("edges")) == want_edges, f"edges diverged, crash point {n}"
        got_linked = sorted(map(tuple, store.read("linked").select(*linked_cols).collect()))
        assert got_linked == want_linked, f"linked diverged, crash point {n}"
        _sh.rmtree(d, ignore_errors=True)


def test_empty_batch_settles_ingest_only_backlog(spark, spark_corpus, tmp_path):
    """Review r5: an ingest-only batch leaves edge-merge AND linking debt;
    a later full-DAG batch that happens to be empty (or fully redelivered)
    must still settle both — the consistent dict stamp alone is not 'no
    work to do'."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "backlog"))
    b1 = pages.limit(150).localCheckpoint()
    b2 = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)  # full DAG, stamped
    incremental_ingest(spark, b2, store)  # ingest-only: debt
    m = incremental_ingest(spark, pages.limit(0), store, alias_dict=alias)  # empty full-DAG
    assert m["new_pages"] == 0 and m.get("merged_edge_pages", 0) > 0
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    full.triples.unpersist()
    full.canon_map.unpersist()


def test_full_dag_batch_settles_prior_ingest_only_links(spark, spark_corpus, tmp_path):
    """Same debt settled by a normal (non-empty) full-DAG batch: its linked
    stage must cover the ingest-only batch's mentions too, not just its
    own (append-only linking previously skipped them forever)."""
    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "backlog2"))
    b1 = pages.limit(100).localCheckpoint()
    rest = pages.join(b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    b2 = rest.limit(100).localCheckpoint()
    b3 = rest.join(b2.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti").localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)
    incremental_ingest(spark, b2, store)  # ingest-only
    incremental_ingest(spark, b3, store, alias_dict=alias)  # full DAG settles b2's debt
    full = run_pipeline(spark, pages, alias, out_dir=None, collect_lineage=False)
    want_linked = sorted(map(tuple, full.linked.collect()))
    got_linked = sorted(map(tuple, store.read("linked").select(*full.linked.columns).collect()))
    assert got_linked == want_linked
    assert _edges_key(store.read("edges")) == _edges_key(full.edges)
    full.triples.unpersist()
    full.canon_map.unpersist()


def _direct_features(spark, store, pr_iters, lpa_iters):
    from docprocai_service_spark.operators.graph import (
        label_propagation,
        pagerank_fixed,
    )

    e = store.read("edges").select(
        F.col("src_entity").alias("src"), F.col("dst_entity").alias("dst"), "weight"
    )
    ranks = {
        r.id: r.rank
        for r in pagerank_fixed(e, iters=pr_iters, weight_col="weight").collect()
    }
    comms = {
        r.id: r.label
        for r in label_propagation(e, iters=lpa_iters, weight_col="weight").collect()
    }
    return {k: (v, comms.get(k, k)) for k, v in ranks.items()}


def test_refresh_graph_features_incremental(spark, spark_corpus, tmp_path):
    """The analytics arm of the incremental loop: graph_features is a pure
    function of the edges stage — equal to a direct recompute after every
    merge, a fingerprint no-op between merges, and convergent when the
    stamp is lost (the crash window between upsert and annotate)."""
    from docprocai_service_spark.streaming.incremental import refresh_graph_features

    pages, alias = spark_corpus
    store = StageStore(spark, str(tmp_path / "gfeat"))
    b1 = pages.limit(100).localCheckpoint()
    incremental_ingest(spark, b1, store, alias_dict=alias)
    r1 = refresh_graph_features(store, pr_iters=3, lpa_iters=2)
    assert r1["refreshed"] is True
    got1 = {
        r.entity_id: (r.rank, r.community)
        for r in store.read("graph_features").collect()
    }
    assert got1 == _direct_features(spark, store, 3, 2)

    # unchanged edges: fingerprint short-circuit, no recompute
    r2 = refresh_graph_features(store, pr_iters=3, lpa_iters=2)
    assert r2 == {"refreshed": False, "edges_fp": r1["edges_fp"]}

    # second batch changes the edge content: refresh converges to the new set
    b2 = pages.join(
        b1.select("url", "warc_ts"), ["url", "warc_ts"], "left_anti"
    ).localCheckpoint()
    incremental_ingest(spark, b2, store, alias_dict=alias)
    r3 = refresh_graph_features(store, pr_iters=3, lpa_iters=2)
    assert r3["refreshed"] is True and r3["edges_fp"] != r1["edges_fp"]
    got3 = {
        r.entity_id: (r.rank, r.community)
        for r in store.read("graph_features").collect()
    }
    assert got3 == _direct_features(spark, store, 3, 2)

    # crash between upsert and stamp: a foreign/missing stamp re-runs the
    # refresh and converges to the identical table (upsert replaces by key)
    store.annotate("graph_features", {"edges_fp": "torn"})
    r4 = refresh_graph_features(store, pr_iters=3, lpa_iters=2)
    assert r4["refreshed"] is True and r4["edges_fp"] == r3["edges_fp"]
    got4 = {
        r.entity_id: (r.rank, r.community)
        for r in store.read("graph_features").collect()
    }
    assert got4 == got3

    # entity-set SHRINK (the rebuild_edges-with-new-canon path): a stale
    # feature row for an entity no longer in the edges stage must NOT
    # survive the refresh — the stage is invalidated, not merged into
    ghost = spark.createDataFrame(
        [("GHOST:merged-away", 0, "GHOST:merged-away")],
        "entity_id string, rank long, community string",
    )
    store.upsert("graph_features", ghost, keys=["entity_id"])
    store.annotate("graph_features", {"edges_fp": "torn-again"})
    refresh_graph_features(store, pr_iters=3, lpa_iters=2)
    got5 = {
        r.entity_id: (r.rank, r.community)
        for r in store.read("graph_features").collect()
    }
    assert got5 == got3  # ghost purged, everything else identical

    # edges stage required
    empty = StageStore(spark, str(tmp_path / "gfeat_empty"))
    with pytest.raises(ValueError):
        refresh_graph_features(empty)
