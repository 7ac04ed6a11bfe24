"""Per-group ordered batch titling with rewind (§2.5).

The reference packs consecutive segments into an LLM prompt under a token
budget and, when the model's answer covers fewer segments than were sent,
REWINDS the cursor so uncovered segments go into the next batch
(reference: fileextractlib/LectureLlmGenerator.py:29-94). The LLM itself is
out of scope (non-deterministic — SURVEY.md §7); what this module implements
for real is the Spark-side operator shape:

  groupBy(parent).applyInPandas — each group arrives as ONE ordered pandas
  frame (the segments of one lecture), the batching/rewind loop runs
  per-group in Python, and the output is a deterministic title per segment.

The default `titler` is a deterministic stub (first words of the segment,
answering at most `max_answers` per call so the rewind path actually runs);
swap in a real model client on a cluster — the operator contract
(batch in → possibly-shorter title list out → rewind) is what is tested.

Scale notes: one shuffle on the group key; groups are single lectures
(bounded size), so the per-group Python loop is O(group), never O(corpus).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


def stub_titler(max_answers: int = 3) -> Callable[[list[str]], list[str]]:
    """Deterministic stand-in LLM: titles = first 4 words, Title-Cased; answers
    at most `max_answers` items per call (forcing the rewind branch)."""

    def call(texts: list[str]) -> list[str]:
        out = []
        for t in texts[:max_answers]:
            words = (t or "").split()[:4]
            out.append(" ".join(w.capitalize() for w in words) or "(untitled)")
        return out

    return call


def title_segments(
    segments: DataFrame,
    group_col: str = "parent_id",
    order_col: str = "position",
    text_col: str = "text",
    budget_tokens: int = 64,
    titler: Callable[[list[str]], list[str]] | None = None,
) -> DataFrame:
    """segments → (group, position, title, batch_no) via budget-batched calls.

    Packing rule (same as the reference): accumulate segments in order until
    adding the next one would exceed `budget_tokens` (whitespace tokens);
    a batch always contains at least one segment. If the titler answers fewer
    titles than segments sent, the cursor rewinds to the first unanswered
    segment (at-least-once per segment, exactly-one title kept).
    """
    fn = titler or stub_titler()

    def per_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values([order_col]).reset_index(drop=True)
        texts = pdf[text_col].fillna("").tolist()
        n = len(texts)
        titles: list[str] = [""] * n
        batches: list[int] = [0] * n
        i = 0
        batch_no = 0
        while i < n:
            j, used = i, 0
            while j < n:
                cost = max(len(texts[j].split()), 1)
                if j > i and used + cost > budget_tokens:
                    break
                used += cost
                j += 1
            answered = fn(texts[i:j])
            if not answered:  # defensive: a stuck titler must not loop forever
                raise RuntimeError("titler returned no answers for a non-empty batch")
            for k, title in enumerate(answered[: j - i]):
                titles[i + k] = title
                batches[i + k] = batch_no
            i += min(len(answered), j - i)  # rewind: unanswered tail re-batches
            batch_no += 1
        return pd.DataFrame(
            {
                "group": pdf[group_col],
                "position": pdf[order_col],
                "title": titles,
                "batch_no": batches,
            }
        )

    return segments.groupBy(group_col).applyInPandas(
        per_group, schema="group string, position long, title string, batch_no int"
    )
