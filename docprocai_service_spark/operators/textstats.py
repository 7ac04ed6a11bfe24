"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. First-class training-data-pipeline components over
the `documents` table.

Everything here is pure JVM expression (regexp_count / split / length
arithmetic — whole-stage codegen'd), except the winnowing fingerprint which is
an Arrow pandas UDF. Each operator has an exact ANSI-SQL oracle (see
__spark_entry__.oracle_sql) so the driver's DuckDB cross-check validates
values, not just shapes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stopword marker sets per language; counted as whole words.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}


def _marker_count(text: Column, lang: str) -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds predicted_lang: argmax of per-language stopword counts, 'und' if
    no marker hits. Deterministic tie-break by the fixed en>de>fr order."""
    counts = {lang: _marker_count(F.col(text_col), lang) for lang in LANG_MARKERS}
    best = F.greatest(*counts.values())
    pred = (
        F.when(best <= 0, F.lit("und"))
        .when(counts["en"] == best, F.lit("en"))
        .when(counts["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.withColumn("predicted_lang", pred)


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries with
    the GPT-2-style coarse regex — a cheap deterministic stand-in for a real
    BPE tokenizer (tokenizer libs aren't in this container)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length band + punctuation ratio + stopword
    ratio + mean word length band — the standard web-corpus filters
    (C4/Gopher-style rules) as pure column arithmetic."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    n_tokens = token_count(text).cast("double")
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double")
    n_stop = _marker_count(text, "en").cast("double")
    mean_wlen = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))

    len_ok = F.when((n_chars >= 200) & (n_chars <= 20000), 1.0).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio >= 0.01, 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)

    score = (len_ok + punct_ok + stop_ok + wlen_ok) / F.lit(4.0)
    return docs.withColumn("quality", score)


def fingerprint_md5(text: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint (exact-dup key)."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(norm)


def make_winnow_udf(k: int = 8, w: int = 16):
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): min crc32 over
    each window of k-gram hashes, distinct-set, returned sorted — a compact
    rolling-hash document sketch robust to local edits. Arrow-batched.

    Vectorized with the same flat-batch scheme as make_minhash_udf
    (functions/hashing.py:88): k-grams are deduped into ONE batch-level
    unique table, crc32+encode run once per DISTINCT gram (8-char grams
    repeat heavily across a web batch), rows gather their hash streams from
    the shared table, and the windowed min is a per-row
    sliding_window_view().min() — C loops throughout. Output is
    bit-identical to the naive per-gram-crc32 formulation (golden-tested)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        uniq: dict[str, int] = {}
        row_idx: list[np.ndarray] = []
        for t in texts:
            if not t or len(t) < k:
                row_idx.append(np.empty(0, dtype=np.int64))
                continue
            idx = np.empty(len(t) - k + 1, dtype=np.int64)
            for i in range(len(t) - k + 1):
                g = t[i : i + k]
                j = uniq.get(g)
                if j is None:
                    j = len(uniq)
                    uniq[g] = j
                idx[i] = j
            row_idx.append(idx)
        if uniq:
            base = np.fromiter(
                (zlib.crc32(g.encode("utf-8")) for g in uniq), dtype=np.int64, count=len(uniq)
            )
        else:
            base = np.empty(0, dtype=np.int64)
        out = []
        for idx in row_idx:
            if idx.size == 0:
                out.append([])
                continue
            arr = base[idx]
            if arr.size <= w:
                out.append([int(arr.min())])
                continue
            view = np.lib.stride_tricks.sliding_window_view(arr, w)
            out.append(np.unique(view.min(axis=1)).tolist())
        return pd.Series(out)

    return winnow_udf
