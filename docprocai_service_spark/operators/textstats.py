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
    (functions/hashing.py:88), now with NO per-character Python loop: each
    text is decoded once to a uint32 codepoint array (utf-32-le byte view),
    all rows' k-gram windows come from ONE batch-level sliding_window_view,
    the windows are deduped via a void-dtype np.unique(return_inverse=True)
    (C-speed structural compare, no gram strings materialized per position),
    and crc32+utf-8-encode run once per DISTINCT gram (8-char grams repeat
    heavily across a web batch). The windowed min is a per-row
    sliding_window_view().min(). Output is bit-identical to the naive
    per-gram-crc32 formulation (golden-tested)."""

    _SEP = np.array([0xFFFFFFFF], dtype=np.uint32)  # not a valid codepoint

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        sw = np.lib.stride_tricks.sliding_window_view
        # 1) one codepoint array for the WHOLE batch (utf-32-le byte view is
        # an exact per-char codepoint dump), rows separated by a sentinel
        # that cannot occur in text; windows that cross a separator are
        # masked out by position below.
        cps: list[np.ndarray] = []
        counts: list[int] = []  # windows per row (0 for short/empty texts)
        cp_max = 0
        for t in texts:
            if not t or len(t) < k:
                counts.append(0)
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            cps.append(cp)
            counts.append(len(cp) - k + 1)
            cp_max = max(cp_max, int(cp.max()))
        if cps:
            parts: list[np.ndarray] = []
            for c in cps:
                parts.append(c)
                parts.append(_SEP)
            concat = np.concatenate(parts[:-1])
            m = len(concat) - k + 1
            valid = np.ones(m, dtype=bool)
            off = 0
            for c in cps[:-1]:
                s = off + len(c)  # separator index
                valid[max(s - k + 1, 0) : min(s + 1, m)] = False
                off = s + 1
            if k <= 8 and cp_max < 256:
                # 2a) latin fast path: k codepoints ≤ 8 bytes → every window
                # IS one uint64 key (a contiguous byte-view copy, no per-
                # position Python). Dedup via pandas' hash-based factorize
                # (O(n), beats sort-based np.unique when distinct ≪ n).
                b = concat.astype(np.uint8)
                wins = np.ascontiguousarray(sw(b, 8)) if k == 8 else np.ascontiguousarray(
                    np.pad(sw(b, k), ((0, 0), (0, 8 - k)))
                )
                key = wins.view(np.uint64).ravel()[:m]
                codes, uniq_keys = pd.factorize(key[valid])
                ub = np.asarray(uniq_keys, dtype=np.uint64).view(np.uint8).reshape(-1, 8)[:, :k]
                # 3a) crc32 once per DISTINCT gram; chars <256 → latin-1
                # round-trip reproduces the naive t[i:i+k].encode("utf-8")
                base = np.fromiter(
                    (
                        zlib.crc32(r.tobytes().decode("latin-1").encode("utf-8"))
                        for r in np.ascontiguousarray(ub)
                    ),
                    dtype=np.int64,
                    count=len(ub),
                )
                valid_hashes = base[codes]
            else:
                # 2b) full-unicode path: lexsort the k-codepoint windows
                # (column-wise radix passes — void-dtype unique is ~20×
                # slower) and dedup by adjacent-row comparison.
                allw = np.ascontiguousarray(sw(concat, k)[valid])
                order = np.lexsort(allw.T[::-1])
                srt = allw[order]
                neq = np.any(srt[1:] != srt[:-1], axis=1)
                inverse = np.empty(len(allw), dtype=np.int64)
                inverse[order] = np.concatenate(([0], np.cumsum(neq)))
                uniq_cp = np.ascontiguousarray(
                    srt[np.concatenate(([0], np.nonzero(neq)[0] + 1))]
                )
                base = np.fromiter(
                    (
                        zlib.crc32(r.tobytes().decode("utf-32-le").encode("utf-8"))
                        for r in uniq_cp
                    ),
                    dtype=np.int64,
                    count=len(uniq_cp),
                )
                valid_hashes = base[inverse]
        else:
            valid_hashes = np.empty(0, dtype=np.int64)
        # 4) per-row windowed min over the shared hash stream
        out = []
        pos = 0
        for n in counts:
            if n == 0:
                out.append([])
                continue
            arr = valid_hashes[pos : pos + n]
            pos += n
            if arr.size <= w:
                out.append([int(arr.min())])
                continue
            view = sw(arr, w)
            out.append(np.unique(view.min(axis=1)).tolist())
        return pd.Series(out)

    return winnow_udf
