"""Stage 1 — deterministic HTML→text extraction (capability C2).

Replaces the reference's per-page Tika RPC loop
(reference: fileextractlib/PdfProcessor.py:43-61) with ONE vectorized Arrow
pandas UDF over the `html` binary column. The transformation is narrow (no
shuffle): each input partition maps 1:1 to an output partition, so at 100 TB
this stage scales linearly with executors and is bounded only by scan + CPU.

Column pruning matters at scale: the stage selects only (url, warc_ts, lang,
html) so Parquet never materializes other columns, and `html` is dropped
immediately after extraction so the (potentially 100×-larger) raw bytes never
enter a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import extract_text_series


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched, pure function of the html bytes (byte-identity contract)."""
    return extract_text_series(html)


def extract_stage(pages: DataFrame) -> DataFrame:
    """web_pages(url, warc_ts, html, lang) → extracted_text(url, warc_ts, lang, text).

    NULL text = boilerplate-only/empty page, kept as a row (the empty-page
    filter happens at the consumer, mirroring
    reference: fileextractlib/PdfProcessor.py:53-59).
    """
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )
