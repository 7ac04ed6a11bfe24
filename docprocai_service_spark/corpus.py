"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1/F2).

Everything is a pure function of (n_pages, seed): no wall-clock, no external
data, numpy Generator(PCG64) randomness — golden outputs are stable across
machines and partitionings. The corpus plants exactly the hazards the engine
must handle at 100 TB:

  * Zipf(s≈1.1) entity mentions → head-entity join skew (exercises salting)
  * ~2%% near-duplicate pages (same <main> ± one sentence, different url)
    → MinHash-LSH planted positives
  * ~5%% malformed HTML (unclosed tags), ~1%% empty <main> → extractor edge
    cases (analog of the reference's empty-page filter,
    reference: fileextractlib/PdfProcessor.py:53-59)
  * ~5%% duplicate entities (same name ± inflection, distinct ids)
    → canonicalization ground truth
  * ambiguous short aliases (one alias → several entity_ids) → exercises the
    disambiguation argmax (reference: service/DocProcAiService.py:739-753)

Sentences follow the fixed grammar "{SUBJ} {PRED} {OBJ}." over the predicate
vocabulary in functions/text.py, so ground-truth triples are known by
construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from .functions.text import PREDICATES

_FIRST = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli",
    "Vandelay", "Wonka", "Tyrell", "Cyberdyne", "Soylent", "Aperture",
    "Virtucon", "Octan", "Zorg", "Nakatomi", "Monarch", "Gringotts", "Oscorp",
]
_SECOND = [
    "Corp", "Inc", "Labs", "Group", "Systems", "Industries", "Holdings",
    "Partners", "Works", "Tech", "Media", "Energy", "Logistics", "Dynamics",
    "Networks",
]
_MID = [
    "Global", "United", "Advanced", "Digital", "Quantum", "Pacific",
    "Northern", "Royal", "Prime", "Apex",
]
_DUP_VARIANT = "s"  # duplicate entities pluralize (high-Jaccard variant)

_DE_WORDS = "der die das und ist ein eine mit von für nicht auf werden haben".split()
_XX_WORDS = "zorp blint quux frob wibble snark gronk plurf".split()

_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


def entity_name(k: int) -> str:
    """Unique, word-distinct names (no numeric suffixes — a trailing digit
    would make unrelated entities near-duplicates under char-shingle Jaccard
    and poison the canonicalization ground truth). Capacity 3,300."""
    n2 = len(_FIRST) * len(_SECOND)
    if k < n2:
        return f"{_FIRST[k % len(_FIRST)]} {_SECOND[(k // len(_FIRST)) % len(_SECOND)]}"
    j = k - n2
    return (
        f"{_FIRST[j % len(_FIRST)]} {_MID[(j // len(_FIRST)) % len(_MID)]} "
        f"{_SECOND[(j // (len(_FIRST) * len(_MID))) % len(_SECOND)]}"
    )


@dataclass
class Corpus:
    pages: pd.DataFrame  # url, warc_ts, html, text(None), lang
    alias_dict: pd.DataFrame  # alias, entity_id, prior
    truth_triples: pd.DataFrame  # subj/pred/obj surfaces + entity ids + url + sent_no
    dup_groups: list[list[str]] = field(default_factory=list)  # planted entity-dup components


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def make_corpus(
    n_pages: int = 1000,
    n_entities: int = 400,
    n_hosts: int = 50,
    seed: int = 42,
) -> Corpus:
    rng = np.random.default_rng(seed)

    # ---------------- entities: last 5% duplicate the entity 1 before them
    names = [entity_name(k) for k in range(n_entities)]
    dup_groups: list[list[str]] = []
    n_dup = max(1, n_entities // 20)
    for j in range(n_dup):
        k = n_entities - 1 - j * 2  # every other tail slot, no overlap
        if k <= 0:
            break
        names[k] = names[k - 1] + _DUP_VARIANT
        dup_groups.append([f"E{k - 1:06d}", f"E{k:06d}"])
    entity_ids = [f"E{k:06d}" for k in range(n_entities)]
    prior = _zipf_weights(n_entities)

    # ---------------- alias dictionary (F2): canonical + ambiguous short form
    alias_rows: list[tuple[str, str, float]] = []
    for k in range(n_entities):
        alias_rows.append((names[k].lower(), entity_ids[k], float(prior[k])))
        short = names[k].split(" ")[0].lower()  # "acme" → every Acme * entity
        alias_rows.append((short, entity_ids[k], float(prior[k])))
    alias_pdf = pd.DataFrame(alias_rows, columns=["alias", "entity_id", "prior"])

    # ---------------- page plan (all vectorized draws up front)
    langs = rng.choice(["en", "de", "xx"], size=n_pages, p=[0.90, 0.07, 0.03])
    n_sents = rng.integers(3, 12, size=n_pages)
    malformed = rng.random(n_pages) < 0.05
    empty_main = rng.random(n_pages) < 0.01
    near_dup = (rng.random(n_pages) < 0.02) & (np.arange(n_pages) > 0)
    total_sents = int(n_sents.sum())
    subj_k = rng.choice(n_entities, size=total_sents, p=prior)
    obj_k = rng.choice(n_entities, size=total_sents, p=prior)
    pred_i = rng.integers(0, len(PREDICATES), size=total_sents)
    use_short = rng.random((total_sents, 2)) < 0.2  # ambiguous surface forms

    pages, truth = [], []
    prev_sentences: list[tuple[str, str, str, str, str]] = []  # (s_surf,p,o_surf,s_id,o_id)
    cursor = 0
    for i in range(n_pages):
        url = f"https://host{i % n_hosts}.example/p/{i}"
        ts = _BASE_TS + timedelta(seconds=int(i) * 17)
        lang = str(langs[i])

        if near_dup[i] and prev_sentences:
            sentences = prev_sentences[:-1] if len(prev_sentences) > 1 else list(prev_sentences)
            lang = "en"
        elif lang == "en":
            sentences = []
            for j in range(int(n_sents[i])):
                sk, ok_, pi = int(subj_k[cursor]), int(obj_k[cursor]), int(pred_i[cursor])
                s_surf = names[sk].split(" ")[0] if use_short[cursor, 0] else names[sk]
                o_surf = names[ok_].split(" ")[0] if use_short[cursor, 1] else names[ok_]
                sentences.append((s_surf, PREDICATES[pi], o_surf, entity_ids[sk], entity_ids[ok_]))
                cursor += 1
        else:
            words = _DE_WORDS if lang == "de" else _XX_WORDS
            idx = rng.integers(0, len(words), size=(int(n_sents[i]), 6))
            sentences = [
                (" ".join(words[w] for w in row[:3]).capitalize(), "", " ".join(words[w] for w in row[3:]), "", "")
                for row in idx
            ]
            cursor += int(n_sents[i])  # keep draws aligned regardless of lang

        if lang == "en":
            prev_sentences = list(sentences)
            if not empty_main[i]:  # empty <main> pages carry no recoverable triples
                for sent_no, (s_surf, p, o_surf, s_id, o_id) in enumerate(sentences):
                    truth.append((s_surf, p, o_surf, s_id, o_id, url, ts, sent_no))
            paras = [f"<p>{s} {p} {o}.</p>" for s, p, o, *_ in sentences]
        else:
            paras = [f"<p>{s} {o}.</p>" for s, _p, o, *_ in sentences]

        main_inner = "" if empty_main[i] else "\n".join(paras)
        main_close = "" if malformed[i] else "</main>"
        body_close = "" if malformed[i] else "</body></html>"
        html = (
            "<!DOCTYPE html><html><head><title>page</title>"
            "<script>var x=1;</script><style>p{color:red}</style></head><body>"
            "<nav><ul><li>Home</li><li>About</li></ul></nav>"
            "<header><h1>Host news</h1></header>"
            f"<main>{main_inner}{main_close}"
            "<footer>&copy; 2025 example &amp; co</footer>"
            f"{body_close}"
        )
        pages.append((url, ts, html.encode("utf-8"), None, lang))

    pages_pdf = pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"])
    truth_pdf = pd.DataFrame(
        truth,
        columns=["subj", "pred", "obj", "subj_entity", "obj_entity", "url", "warc_ts", "sent_no"],
    )
    return Corpus(pages_pdf, alias_pdf, truth_pdf, dup_groups)


def corpus_to_spark(spark, corpus: Corpus):
    """Materialize the corpus as Spark DataFrames with the declared schemas."""
    from . import schemas

    pages = spark.createDataFrame(corpus.pages, schema=schemas.WEB_PAGES)
    alias = spark.createDataFrame(corpus.alias_dict, schema=schemas.ALIAS_DICT)
    return pages, alias


# ---------------------------------------------------------------------------
# Distributed bench-scale generation. The driver-side make_corpus() is the
# test oracle path (it also returns ground truth); for throughput benchmarks
# the corpus itself must be generated on executors — a driver loop would be
# the bottleneck at bench scale, exactly the per-document-loop mistake the
# reference makes (service/DocProcAiService.py:694-707). Content is a pure
# function of (seed, page id): any partitioning yields identical pages, and a
# near-duplicate of page i re-derives page i-1's sentences from (seed, i-1)
# without any cross-partition communication.
# ---------------------------------------------------------------------------

def alias_dict_pdf(n_entities: int = 400) -> pd.DataFrame:
    names = [entity_name(k) for k in range(n_entities)]
    prior = _zipf_weights(n_entities)
    rows = []
    for k in range(n_entities):
        rows.append((names[k].lower(), f"E{k:06d}", float(prior[k])))
        rows.append((names[k].split(" ")[0].lower(), f"E{k:06d}", float(prior[k])))
    return pd.DataFrame(rows, columns=["alias", "entity_id", "prior"])


def _gen_page(i: int, names: list[str], prior: np.ndarray, n_hosts: int, seed: int,
              min_sents: int, max_sents: int) -> tuple:
    rng = np.random.default_rng((seed, i))
    lang = rng.choice(["en", "de", "xx"], p=[0.90, 0.07, 0.03])
    near_dup = bool(rng.random() < 0.02) and i > 0
    malformed = bool(rng.random() < 0.05)
    empty_main = bool(rng.random() < 0.01)
    if near_dup:
        # re-derive the previous page's sentence stream (pure function of id)
        return _render_page(i, _page_sentences(i - 1, names, prior, seed, min_sents, max_sents)[:-1],
                            "en", n_hosts, malformed, empty_main)
    if lang == "en":
        sents = _page_sentences(i, names, prior, seed, min_sents, max_sents)
    else:
        words = _DE_WORDS if lang == "de" else _XX_WORDS
        n = int(rng.integers(min_sents, max_sents))
        idx = rng.integers(0, len(words), size=(n, 6))
        sents = [
            (" ".join(words[w] for w in row[:3]).capitalize() + " " + " ".join(words[w] for w in row[3:]))
            for row in idx
        ]
    return _render_page(i, sents, str(lang), n_hosts, malformed, empty_main)


def _page_sentences(i: int, names, prior, seed, min_sents, max_sents) -> list[str]:
    rng = np.random.default_rng((seed, i, 1))
    n = int(rng.integers(min_sents, max_sents))
    sk = rng.choice(len(names), size=n, p=prior)
    ok = rng.choice(len(names), size=n, p=prior)
    pi = rng.integers(0, len(PREDICATES), size=n)
    short = rng.random((n, 2)) < 0.2
    out = []
    for j in range(n):
        s = names[sk[j]].split(" ")[0] if short[j, 0] else names[sk[j]]
        o = names[ok[j]].split(" ")[0] if short[j, 1] else names[ok[j]]
        out.append(f"{s} {PREDICATES[pi[j]]} {o}")
    return out

_FILLER = "<li><a href='/x'>Section link with some description text</a></li>" * 20


def _render_page(i, sents, lang, n_hosts, malformed, empty_main):
    url = f"https://host{i % n_hosts}.example/p/{i}"
    ts = _BASE_TS + timedelta(seconds=int(i) * 17)
    paras = "" if empty_main else "\n".join(f"<p>{s}.</p>" for s in sents)
    main_close = "" if malformed else "</main>"
    body_close = "" if malformed else "</body></html>"
    html = (
        "<!DOCTYPE html><html><head><title>page</title>"
        "<script>var x=1; function f(){return 'tracker';}</script>"
        "<style>p{color:red} .nav{display:flex}</style></head><body>"
        f"<nav><ul>{_FILLER}</ul></nav>"
        "<header><h1>Host news</h1></header>"
        f"<main>{paras}{main_close}"
        f"<footer>&copy; 2025 example &amp; co{_FILLER}</footer>"
        f"{body_close}"
    )
    return (url, ts, html.encode("utf-8"), None, lang)


def distributed_pages(spark, n_pages: int, n_entities: int = 400, n_hosts: int = 1000,
                      seed: int = 42, min_sents: int = 20, max_sents: int = 60,
                      partitions: int | None = None):
    """Executor-side page generation: spark.range → mapInPandas (Arrow batches)."""
    from . import schemas

    names = [entity_name(k) for k in range(n_entities)]
    prior = _zipf_weights(n_entities)
    if partitions is None:
        # enough output files that ANY later session gets full scan
        # parallelism regardless of how many cores generated the corpus
        partitions = max(spark.sparkContext.defaultParallelism * 2, 64)

    def gen(batches):
        for pdf in batches:
            rows = [
                _gen_page(int(i), names, prior, n_hosts, seed, min_sents, max_sents)
                for i in pdf["id"]
            ]
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
            yield out

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, schema=schemas.WEB_PAGES)
    )
