"""Deterministic hashing & sketching: shingles, MinHash, SimHash, band keys.

Replaces the reference's quadratic similarity machinery — the multi-scale
OpenCV template-match loop (reference: fileextractlib/ImageTemplateMatcher.py:23-59)
driven all-pairs over every segment of every other record
(reference: service/DocProcAiService.py:710-757) — with sketch + LSH banding,
the canonical Spark answer to a similarity theta-join: candidate generation
becomes an equi-join on band keys, so the O(n²) comparison never happens.

Determinism: base shingle hash is crc32 (stable across machines/processes,
unlike Python's salted hash()); the k MinHash permutations are affine maps
(a_i·x + b_i) mod p with (a, b) drawn once from a fixed-seed PCG64. Signatures
are therefore pure functions of the input string — safe for golden tests and
checkpoint resume.

MinHash signatures are computed in an Arrow-batched pandas UDF (numpy inner
loop); band keys and signature-similarity are pure JVM expressions
(transform/slice/sha2, zip_with/aggregate) so the join side stays inside
whole-stage codegen.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE_P = (1 << 61) - 1
DEFAULT_K = 64  # signature length
DEFAULT_BANDS = 16  # 16 bands × 4 rows: s-curve threshold ≈ (1/16)^(1/4) ≈ 0.50


def _permutations(k: int, seed: int = 12345) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=k, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=k, dtype=np.uint64)
    return a, b


def char_shingles(s: str, n: int = 3) -> set[str]:
    s = s.lower()
    if len(s) <= n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def word_shingles(s: str, n: int = 3) -> set[str]:
    toks = s.lower().split()
    if len(toks) <= n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(s: str, k: int = DEFAULT_K, shingle: str = "char", n: int = 3) -> list[int]:
    """Scalar oracle-side signature (tests); the UDF below must match exactly."""
    a, b = _permutations(k)
    sh = char_shingles(s, n) if shingle == "char" else word_shingles(s, n)
    if not sh:
        return [0] * k
    base = np.array([zlib.crc32(x.encode("utf-8")) for x in sorted(sh)], dtype=np.uint64)
    # Effective permutation is ((a·x + b) mod 2^64) mod p: the uint64 product
    # wraps mod 2^64 BEFORE the % p (a ≤ p < 2^61, base < 2^32, so a·base can
    # reach ~2^93). The wraparound is intentional — it is deterministic, the
    # oracle and the UDF wrap identically, and empirically the family is
    # uniform enough for LSH banding; it is just not the textbook affine map.
    vals = (base[:, None] * a[None, :] + b[None, :]) % MERSENNE_P
    return [int(v) for v in vals.min(axis=0)]


def _shingle_list(s: str, n: int, word: bool) -> list[str]:
    """Shingles WITH duplicates (min-over-duplicates == min-over-set, so the
    per-row set() of char_shingles/word_shingles is skipped on the hot path)."""
    if word:
        toks = s.lower().split()
        if len(toks) <= n:
            return [" ".join(toks)] if toks else []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    s = s.lower()
    if len(s) <= n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def make_minhash_udf(k: int = DEFAULT_K, shingle: str = "char", n: int = 3):
    """Arrow-batched signature UDF: string column → array<long> of length k.

    Vectorized across the WHOLE batch, not per row: shingles are deduped into
    one batch-level unique table (crc32 once per distinct shingle — n-grams
    repeat heavily across documents), the affine maps run as ONE
    (uniques × k) matmul, and per-row mins come from a single
    np.minimum.reduceat over the gathered rows. Python-per-row work is only
    the string slicing that builds shingles.
    """
    a, b = _permutations(k)
    word = shingle != "char"

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(col: pd.Series) -> pd.Series:
        nrows = len(col)
        uniq: dict[str, int] = {}
        flat_idx: list[int] = []
        counts = np.zeros(nrows, dtype=np.int64)
        for i, s in enumerate(col):
            if s is None:
                continue
            row_n = 0
            for sh in _shingle_list(s, n, word):
                j = uniq.get(sh)
                if j is None:
                    j = len(uniq)
                    uniq[sh] = j
                flat_idx.append(j)
                row_n += 1
            counts[i] = row_n
        empty_sig = [0] * k
        if not uniq:
            return pd.Series([empty_sig] * nrows)
        base = np.fromiter(
            (zlib.crc32(x.encode("utf-8")) for x in uniq), dtype=np.uint64, count=len(uniq)
        )
        # same intentional mod-2^64 wraparound as minhash_signature (oracle)
        vals = (base[:, None] * a[None, :] + b[None, :]) % MERSENNE_P
        gathered = vals[np.asarray(flat_idx, dtype=np.int64)]
        starts = np.zeros(nrows, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = counts > 0
        mins = np.minimum.reduceat(gathered, starts[nonempty], axis=0).astype(np.int64)
        out: list[list[int]] = []
        mi = 0
        for i in range(nrows):
            if counts[i]:
                out.append(mins[mi].tolist())
                mi += 1
            else:
                out.append(empty_sig)
        return pd.Series(out)

    return minhash_udf


def band_keys(sig: Column, bands: int = DEFAULT_BANDS, k: int = DEFAULT_K) -> Column:
    """array<long> signature → array<string> of `bands` LSH bucket keys (pure JVM).

    Key = sha2("<band_idx>:" + comma-joined signature slice) — band index is
    embedded so buckets from different bands never collide.
    """
    r = k // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.sha2(
            F.concat_ws(
                ":",
                i.cast("string"),
                F.concat_ws(",", F.transform(F.slice(sig, i * r + 1, r), lambda x: x.cast("string"))),
            ),
            256,
        ),
    )


def signature_similarity(sig1: Column, sig2: Column) -> Column:
    """Estimated Jaccard = fraction of equal MinHash components (pure JVM)."""
    eq = F.zip_with(sig1, sig2, lambda x, y: F.when(x == y, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sig1)


def jaccard(s1: str, s2: str, shingle: str = "char", n: int = 3) -> float:
    """Exact shingle-set Jaccard (scalar oracle)."""
    f = char_shingles if shingle == "char" else word_shingles
    a, b = f(s1 or "", n), f(s2 or "", n)
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def make_jaccard_udf(shingle: str = "char", n: int = 3):
    """Arrow-batched exact Jaccard over two string columns.

    Used to *verify* LSH candidate pairs: the MinHash estimate has ~1/√k
    variance, which near a threshold turns borderline pairs into coin flips;
    exact verification on the (already ~linear) candidate set is deterministic
    and cheap because LSH pruned the quadratic blowup first.
    """
    f = char_shingles if shingle == "char" else word_shingles

    @F.pandas_udf(T.DoubleType())
    def jaccard_udf(c1: pd.Series, c2: pd.Series) -> pd.Series:
        # candidate pairs repeat the same documents many times — shingle each
        # DISTINCT string once per Arrow batch
        cache: dict[str, frozenset] = {}

        def sh(x: str) -> frozenset:
            s = cache.get(x)
            if s is None:
                s = frozenset(f(x, n))
                cache[x] = s
            return s

        out = np.empty(len(c1), dtype=np.float64)
        for i, (x, y) in enumerate(zip(c1, c2)):
            a, b = sh(x or ""), sh(y or "")
            u = len(a | b)
            out[i] = (len(a & b) / u) if u else 1.0
        return pd.Series(out)

    return jaccard_udf


# ------------------------------------------------------------------ SimHash
def simhash64(s: str, n: int = 3) -> int:
    """Scalar 64-bit SimHash over char n-gram shingles (oracle/tests)."""
    sh = char_shingles(s, n)
    if not sh:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for x in sorted(sh):
        h = np.uint64(zlib.crc32(x.encode("utf-8")) | (zlib.crc32(x[::-1].encode("utf-8")) << 32))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = sum(1 << i for i in range(64) if acc[i] > 0)
    return out - (1 << 64) if out >= (1 << 63) else out  # as signed int64


def make_simhash_udf(n: int = 3):
    """Batch-vectorized SimHash: unique shingles hashed once per Arrow batch,
    ±1 bit matrix built once (uniques × 64), per-row sums via one
    np.add.reduceat, bit-packing as a single vectorized shift-sum. Matches
    simhash64 exactly (per-row shingle SETS — duplicates count once)."""
    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def simhash_udf(col: pd.Series) -> pd.Series:
        nrows = len(col)
        uniq: dict[str, int] = {}
        flat_idx: list[int] = []
        counts = np.zeros(nrows, dtype=np.int64)
        for i, s in enumerate(col):
            if not s:
                continue
            sh = char_shingles(s, n)
            for x in sh:
                j = uniq.get(x)
                if j is None:
                    j = len(uniq)
                    uniq[x] = j
                flat_idx.append(j)
            counts[i] = len(sh)
        if not uniq:
            return pd.Series(np.zeros(nrows, dtype=np.int64))
        h = np.fromiter(
            (
                zlib.crc32(x.encode("utf-8")) | (zlib.crc32(x[::-1].encode("utf-8")) << 32)
                for x in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        bits_pm = np.where(((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(bool), 1, -1).astype(np.int32)
        gathered = bits_pm[np.asarray(flat_idx, dtype=np.int64)]
        starts = np.zeros(nrows, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        nonempty = counts > 0
        acc = np.add.reduceat(gathered, starts[nonempty], axis=0)
        packed = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out = np.zeros(nrows, dtype=np.int64)
        out[nonempty] = packed.view(np.int64)
        return pd.Series(out)

    return simhash_udf


def hamming64(c1: Column, c2: Column) -> Column:
    """Hamming distance between two signed-64-bit SimHashes (pure JVM bit_count)."""
    return F.bit_count(c1.bitwiseXOR(c2))
