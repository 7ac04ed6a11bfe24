"""Pure-Python, non-Spark oracle for the KG pipeline front half.

The reference repo ships no tests at all (SURVEY.md §5.1), so this module
*defines* the executable specification: a slow, obviously-correct,
row-at-a-time implementation of extract → sentences → mentions → triples.
The Spark pipeline must match its extracted text byte-identically per url and
its triples at P/R ≥ 0.95 (BASELINE.json).

It deliberately mirrors the reference's per-document loop shape
(reference: service/DocProcAiService.py:694-707 — one document at a time) so
the comparison is "Spark plan vs the reference's sequential semantics".
"""

from __future__ import annotations

import calendar
import hashlib
from typing import Any

from .functions.text import extract_text_str, parse_triple, split_sentences


def extract_pages(rows: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """rows: dicts with url, warc_ts, html, lang → adds 'text' (None if empty)."""
    out = []
    for r in rows:
        out.append({**r, "text": extract_text_str(r["html"])})
    return out


def mention_id(url: str, warc_ts, sent_no: int, role: str, surface: str) -> str:
    # Naive timestamps are UTC wall time (session tz is UTC) — use timegm, not
    # .timestamp(), so the id does not depend on the host's local timezone.
    if hasattr(warc_ts, "timetuple"):
        ts_us = calendar.timegm(warc_ts.timetuple()) * 1_000_000 + warc_ts.microsecond
    else:
        ts_us = int(warc_ts)
    key = f"{url}|{ts_us}|{sent_no}|{role}|{surface}"
    return hashlib.sha256(key.encode("utf-8")).hexdigest()


def triples_and_mentions(
    extracted: list[dict[str, Any]],
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Per-url ordered sentence scan → (triples, mentions).

    Only lang == 'en' rows enter the triple stage — the dispatch analog of the
    reference's content-type branch (reference: fileextractlib/DocumentProcessor.py:25-30).
    """
    triples, mentions = [], []
    for r in extracted:
        if r["lang"] != "en" or not r.get("text"):
            continue
        for sent_no, sent in enumerate(split_sentences(r["text"])):
            parsed = parse_triple(sent)
            if parsed is None:
                continue
            subj, pred, obj = parsed
            triples.append(
                {
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "url": r["url"],
                    "warc_ts": r["warc_ts"],
                    "sent_no": sent_no,
                }
            )
            for role, surface in (("subj", subj), ("obj", obj)):
                mentions.append(
                    {
                        "mention_id": mention_id(r["url"], r["warc_ts"], sent_no, role, surface),
                        "url": r["url"],
                        "warc_ts": r["warc_ts"],
                        "sent_no": sent_no,
                        "surface": surface,
                        "role": role,
                    }
                )
    return triples, mentions


def run_reference(pages_rows: list[dict[str, Any]]):
    """Full oracle front half: returns (extracted, triples, mentions)."""
    extracted = extract_pages(pages_rows)
    triples, mentions = triples_and_mentions(extracted)
    return extracted, triples, mentions
