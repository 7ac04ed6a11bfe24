"""Extraction contract: byte identity, determinism, edge cases (SURVEY §5.2 #3)."""

from __future__ import annotations

import pandas as pd

from docprocai_service_spark.functions.text import extract_text_series, extract_text_str
from docprocai_service_spark.operators.extract import extract_stage

EDGE_CASES = [
    b"",
    b"no tags at all",
    b"<html><body><p>plain body</p></body></html>",
    b"<main><p>only main</p></main>",
    b"<main><p>unclosed main",  # malformed: no </main>
    b"<body><nav>skip</nav><p>keep</p>",  # malformed: no </body>
    b"<main></main>",  # empty main -> None
    b"<main>  \n\t  </main>",  # whitespace-only -> None
    b"<main><p>a &amp; b &lt;c&gt; &nbsp;&quot;d&quot;</p></main>",
    b"<main><p>tail truncated <a href='x",  # trailing unclosed tag
    "<main><p>unicode ümläut — ok</p></main>".encode(),
    b"<MAIN><P>CASE insensitive</P></MAIN>",
    b"<script>var a = '<main>fake</main>';</script><main><p>real</p></main>",
    b"<main><p>a</p><!-- <p>commented out</p> --><p>b</p></main>",
]


def test_scalar_vs_vectorized_byte_identity_on_edges():
    got = extract_text_series(pd.Series(EDGE_CASES, dtype=object)).tolist()
    want = [extract_text_str(h) for h in EDGE_CASES]
    assert got == want


def test_scalar_vs_vectorized_on_corpus(corpus):
    got = extract_text_series(corpus.pages["html"]).tolist()
    want = [extract_text_str(h) for h in corpus.pages["html"]]
    assert got == want


def test_empty_and_boilerplate_only_pages_are_null():
    assert extract_text_str(b"<main></main>") is None
    assert extract_text_str(b"<body><nav>x</nav><footer>y</footer></body>") is None


def test_idempotence():
    # extracting already-extracted text must be a fixpoint (pure text in = out)
    t = extract_text_str(b"<main><p>Acme Corp acquired Globex.</p></main>")
    assert extract_text_str(t.encode("utf-8")) == t


def test_spark_matches_oracle_bytes(spark, spark_corpus, corpus):
    pages, _ = spark_corpus
    got = {r["url"]: r["text"] for r in extract_stage(pages.repartition(7)).collect()}
    for rec in corpus.pages.to_dict("records"):
        assert got[rec["url"]] == extract_text_str(rec["html"]), rec["url"]


def test_partitioning_invariance(spark, spark_corpus):
    pages, _ = spark_corpus
    a = {r["url"]: r["text"] for r in extract_stage(pages.repartition(3)).collect()}
    b = {r["url"]: r["text"] for r in extract_stage(pages.repartition(17)).collect()}
    assert a == b
