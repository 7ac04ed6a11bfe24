"""Stage 2 — sentence split + OpenIE-style triple + mention extraction (C3/C5).

The reference does this shape as a per-document Python loop producing many
segment rows from one document (UDTF analog,
reference: fileextractlib/PdfProcessor.py:43-61 and the sessionized scan at
fileextractlib/VideoProcessor.py:92-174). Here the whole stage is **pure JVM
expressions** — split / filter / posexplode / regexp_extract / sha2 — so it
runs inside whole-stage codegen with zero Python in the hot path. That is a
deliberate strengthening of the input-hint's "vectorized UDFs" floor: the
fastest UDF is the one you didn't write.

Patterns (SENT_SPLIT_REGEX, TRIPLE_REGEX) are shared constants with the
pure-Python oracle (functions/text.py), keeping Java/Python regex semantics
aligned; tests assert exact triple equality on the synthetic corpus.

Scale notes: narrow stage (no shuffle); explode fan-out is ~#sentences per
page which is bounded; deterministic mention ids are sha256 of
(url, warc_ts, sent_no, role, surface) — never UUIDs (SURVEY.md §2.8), so
re-runs are idempotent and resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import PRED_SCAN_REGEX, SENT_SPLIT_REGEX


def sentences_stage(extracted: DataFrame) -> DataFrame:
    """extracted_text → one row per (url, warc_ts, sent_no, sentence).

    Only lang='en' rows enter (dispatch analog of
    reference: fileextractlib/DocumentProcessor.py:25-30); empty fragments are
    dropped BEFORE numbering so sent_no matches the oracle.

    NULL-text pages need no explicit filter: split(NULL)→NULL and
    posexplode(NULL) emits zero rows. An isNotNull(text) predicate here would
    be pushed by Catalyst below the extract projection, substituting — and
    thus evaluating — the Arrow extract UDF a second time per page (observed
    as two ArrowEvalPython nodes in the plan; tests/test_plans.py pins one).
    """
    sents = F.filter(
        F.split(F.col("text"), SENT_SPLIT_REGEX),
        lambda x: x != F.lit(""),
    )
    return (
        extracted.filter(F.col("lang") == "en")
        .select("url", "warc_ts", F.posexplode(sents).alias("sent_no", "sentence"))
    )


def triples_stage(extracted: DataFrame) -> DataFrame:
    """extracted_text → triples(subj, pred, obj, url, warc_ts, sent_no).

    One regex match per sentence (leftmost ' pred ' occurrence), then a
    2-limit split on the matched predicate — semantically identical to
    matching TRIPLE_REGEX three times but ~3× cheaper, and the regex engine
    only scans each sentence once. Exactness vs the oracle is asserted by
    tests/test_triples.py on every corpus shape.
    """
    s = sentences_stage(extracted)
    # The subj/obj carve-out is pure string arithmetic, NOT a dynamic split:
    # split(sentence, concat(' ', pred, ' ')) compiles a regex PER ROW
    # (UTF8String.split → Pattern.compile), an allocation storm that showed up
    # as executor threads pinned in Pattern.compile + GC collapse at high
    # thread counts. instr/substring are regex-free; the leftmost PRED_SCAN
    # match at position p guarantees instr(sentence, ' pred ') == p (no
    # earlier occurrence of any predicate exists, or the regex would have
    # matched there), so the rewrite is exactly the 2-limit split.
    parsed = (
        s.withColumn("pred", F.regexp_extract("sentence", PRED_SCAN_REGEX, 1))
        .filter(F.col("pred") != "")
        .withColumn("__pos", F.expr("instr(sentence, concat(' ', pred, ' '))"))
        .select(
            F.expr("substring(sentence, 1, __pos - 1)").alias("subj"),
            "pred",
            F.regexp_replace(
                F.expr("substring(sentence, __pos + length(pred) + 2)"), r"\.$", ""
            ).alias("obj"),
            "url",
            "warc_ts",
            "sent_no",
        )
        .filter((F.col("subj") != "") & (F.col("obj") != ""))
    )
    return parsed


def mentions_stage(triples: DataFrame) -> DataFrame:
    """triples → mentions, two per triple (subj + obj roles).

    mention_id = sha256(url|unix_micros(warc_ts)|sent_no|role|surface),
    identical to reference_impl.mention_id.
    """
    role_surface = F.explode(
        F.array(
            F.struct(F.lit("subj").alias("role"), F.col("subj").alias("surface")),
            F.struct(F.lit("obj").alias("role"), F.col("obj").alias("surface")),
        )
    ).alias("rs")
    m = triples.select("url", "warc_ts", "sent_no", role_surface)
    return m.select(
        F.sha2(
            F.concat_ws(
                "|",
                F.col("url"),
                F.unix_micros(F.col("warc_ts")).cast("string"),
                F.col("sent_no").cast("string"),
                F.col("rs.role"),
                F.col("rs.surface"),
            ),
            256,
        ).alias("mention_id"),
        "url",
        "warc_ts",
        "sent_no",
        F.col("rs.surface").alias("surface"),
        F.col("rs.role").alias("role"),
    )
