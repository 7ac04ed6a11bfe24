"""Deterministic HTML→text extraction + sentence/triple grammar.

This module is the *single source of truth* for the extraction contract: the
pure-Python scalar implementation (used by the oracle in reference_impl.py)
and the vectorized pandas implementation (used by the Spark pandas UDF) share
the same compiled regexes, so extracted text is byte-identical per url across
Arrow batches and partitionings — the hard determinism bar from SURVEY.md §7.

The reference delegates this to Apache Tika over a JVM boundary, one page at a
time (reference: fileextractlib/PdfProcessor.py:43-61, 15-43 LoC around Tika
calls). Tika is non-reproducible across versions and a per-row RPC; here the
extractor is a trafilatura-style boilerplate-stripping rule chain:

  1. decode UTF-8 (errors=replace)
  2. drop <script>/<style> blocks and <!-- comments -->
  3. take the first <main> block (tolerating a missing </main> — ~5%% of crawl
     rows are malformed); else <body>; else the whole document
  4. drop nav/header/footer/aside boilerplate blocks
  5. block-closing tags become newlines, remaining tags are stripped
     (including a trailing unclosed tag), basic entities unescaped
  6. per-line whitespace collapse, empty lines dropped, lines joined by \n

Empty results map to NULL — the analog of the reference's empty-page filter
(reference: fileextractlib/PdfProcessor.py:53-59).
"""

from __future__ import annotations

import re

import pandas as pd

# --------------------------------------------------------------- regexes
# Compiled once; both the scalar and the vectorized paths use exactly these.
# script/style/comment removal is ONE leftmost-first alternation pass (a
# comment hides a script inside it and vice versa — more HTML-correct than
# three sequential passes, and 3× fewer scans of the document).
_RE_DROP = re.compile(r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>|<!--.*?-->")
_RE_MAIN = re.compile(r"(?is)<main\b[^>]*>(.*?)</main>")
_RE_MAIN_OPEN = re.compile(r"(?is)<main\b[^>]*>(.*)$")
_RE_BODY = re.compile(r"(?is)<body\b[^>]*>(.*?)</body>")
_RE_BODY_OPEN = re.compile(r"(?is)<body\b[^>]*>(.*)$")
_RE_BOILER = re.compile(r"(?is)<(nav|header|footer|aside)\b[^>]*>.*?</\1>")
_RE_BLOCK_CLOSE = re.compile(r"(?i)<br\s*/?>|</(p|div|li|ul|ol|h[1-6]|tr|table|section|article|blockquote)>")
_RE_TAG = re.compile(r"(?s)<[^>]*>")
_RE_TAG_OPEN_TRAIL = re.compile(r"<[^>]*$")
# Single-pass fusion of _RE_TAG then _RE_TAG_OPEN_TRAIL (vectorized path
# only; the scalar oracle keeps the two passes so tests pin equivalence).
# Proof sketch: both scan left→right; at an unconsumed '<' with a '>'
# somewhere after it, both remove exactly '<'..first-'>' ; at a '<' with NO
# '>' after it, pass 1 leaves the tail byte-identical (no further match is
# possible) and pass 2 removes '<'..EOF — which is precisely what the
# second alternative does in the fused scan. Tag removal never creates new
# '<' or '>' characters, so the induction carries through the whole string.
_RE_TAG_ALL = re.compile(r"(?s)<[^>]*>|<[^>]*$")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_LINE_EDGE = re.compile(r"(?m)^[ ]+|[ ]+$")
_RE_EMPTY_LINES = re.compile(r"\n{2,}")

# Entity unescape: ONE left-to-right pass over a fixed table. Equivalent to
# the old sequential per-entity replaces (replacements are never rescanned,
# so "&amp;lt;" still yields literal "&lt;", not "<") but scans the text once.
_ENTITY_MAP = {
    "&nbsp;": " ",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&amp;": "&",
}
_RE_ENTITY = re.compile("|".join(re.escape(k) for k in _ENTITY_MAP))


def _entity_sub(m: re.Match) -> str:
    return _ENTITY_MAP[m.group(0)]

# ------------------------------------------------------- triple grammar
# OpenIE-style predicate vocabulary; longest-first so the alternation prefers
# multi-word predicates. Must stay valid in BOTH Python `re` and Java regex —
# the triple stage runs JVM-side via split/regexp_extract (whole-stage
# codegen), while the oracle runs the same pattern through `re`.
PREDICATES = [
    "is headquartered in",
    "is located in",
    "partnered with",
    "invested in",
    "merged with",
    "acquired",
    "founded",
    "employs",
    "produces",
    "supplies",
    "owns",
    "sued",
]
_PRED_ALT = "|".join(sorted(PREDICATES, key=len, reverse=True))

# Sentence boundary: split after ./!/? followed by whitespace, or at line
# breaks. One pattern, used by BOTH the oracle (`re.split`) and the Spark
# stage (`F.split`, java.util.regex) — lookbehind semantics are identical.
SENT_SPLIT_REGEX = r"(?<=[.!?])\s+|\n+"
_RE_SENT_SPLIT = re.compile(SENT_SPLIT_REGEX)

# subj PRED obj. — non-greedy leftmost predicate, optional trailing period.
TRIPLE_REGEX = rf"^(.+?) ({_PRED_ALT}) (.+?)\.?$"
_RE_TRIPLE = re.compile(TRIPLE_REGEX)

# Leftmost space-delimited predicate — the single-scan variant the Spark
# stage uses (one regexp_extract + split instead of three full matches).
PRED_SCAN_REGEX = rf" ({_PRED_ALT}) "


# ------------------------------------------------- scalar (oracle) path
def extract_text_str(html: bytes | str | None) -> str | None:
    """Pure scalar extraction — the oracle the Spark path must match byte-for-byte."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _RE_DROP.sub("", s)
    for rx in (_RE_MAIN, _RE_MAIN_OPEN, _RE_BODY, _RE_BODY_OPEN):
        m = rx.search(s)
        if m:
            s = m.group(1)
            break
    s = _RE_BOILER.sub("", s)
    s = _RE_BLOCK_CLOSE.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _RE_TAG_OPEN_TRAIL.sub("", s)
    s = _RE_ENTITY.sub(_entity_sub, s)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_LINE_EDGE.sub("", s)
    s = _RE_EMPTY_LINES.sub("\n", s).strip("\n")
    return s if s else None


def split_sentences(text: str | None) -> list[str]:
    """Sentence split shared by oracle and tests; the Spark stage uses the
    identical SENT_SPLIT_REGEX via F.split (JVM regex). Empty fragments are
    dropped on both sides before sentence numbering."""
    if not text:
        return []
    return [s for s in _RE_SENT_SPLIT.split(text) if s]


def parse_triple(sentence: str) -> tuple[str, str, str] | None:
    """Oracle-side (subj, pred, obj) parse; Spark uses TRIPLE_REGEX via
    regexp_extract with identical semantics."""
    m = _RE_TRIPLE.match(sentence)
    if not m:
        return None
    return m.group(1), m.group(2), m.group(3)


# ---------------------------------------------- vectorized (Spark) path
def _to_str_series(html: pd.Series) -> pd.Series:
    sample = html.dropna()
    if len(sample) and isinstance(sample.iloc[0], (bytes, bytearray)):
        return html.str.decode("utf-8", errors="replace").astype("string")
    return html.astype("string")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over an Arrow batch (pandas .str ops end-to-end;
    no per-row Python). Same regexes as extract_text_str."""
    s = _to_str_series(html)
    s = s.str.replace(_RE_DROP, "", regex=True)
    # fallback chain: main -> unclosed main -> body -> unclosed body -> as-is.
    # Each fallback regex runs ONLY on the rows the previous steps left null
    # (r7, guide §1.2 "don't compute things you throw away": the old chain
    # ran every fallback extract over every row and discarded the ~95% whose
    # <main> already matched — three full-document regex passes wasted on a
    # normal crawl batch). fillna semantics are unchanged by construction.
    extracted = s.str.extract(_RE_MAIN, expand=False)
    for rx in (_RE_MAIN_OPEN, _RE_BODY, _RE_BODY_OPEN):
        na = extracted.isna() & s.notna()
        if not na.any():
            break
        extracted.loc[na] = s[na].str.extract(rx, expand=False)
    s = extracted.fillna(s)
    s = s.str.replace(_RE_BOILER, "", regex=True)
    s = s.str.replace(_RE_BLOCK_CLOSE, "\n", regex=True)
    # one fused pass for tag strip + unclosed-trailing-tag strip (see
    # _RE_TAG_ALL: provably the same result as the oracle's two passes)
    s = s.str.replace(_RE_TAG_ALL, "", regex=True)
    s = s.str.replace(_RE_ENTITY, _entity_sub, regex=True)
    s = s.str.replace(_RE_SPACES, " ", regex=True)
    s = s.str.replace(_RE_LINE_EDGE, "", regex=True)
    s = s.str.replace(_RE_EMPTY_LINES, "\n", regex=True).str.strip("\n")
    s = s.where(s.str.len() > 0)  # empty -> NULL (empty-page filter)
    return s.astype(object).where(s.notna(), None)
