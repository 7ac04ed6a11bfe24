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
    rolling-hash document sketch robust to local edits. Arrow-batched."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t or len(t) < k:
                out.append([])
                continue
            grams = [zlib.crc32(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)]
            arr = np.array(grams, dtype=np.int64)
            if len(arr) <= w:
                out.append(sorted({int(arr.min())}))
                continue
            view = np.lib.stride_tricks.sliding_window_view(arr, w)
            out.append(sorted({int(x) for x in view.min(axis=1)}))
        return pd.Series(out)

    return winnow_udf
