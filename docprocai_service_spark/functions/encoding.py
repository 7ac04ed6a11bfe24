"""Binary↔text encoding scalars (§2.8).

The reference base64-encodes thumbnails into data URIs in its DTO mapper
(reference: dto/mapper.py:21,34 — `"data:image/jpeg;base64," + b64encode(...)`).
Here it is a pure-JVM column expression (concat + base64 — whole-stage
codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def data_uri(col: Column, mime: str = "image/jpeg") -> Column:
    """binary (or string, cast) column → RFC 2397 data URI string.

    Spark's base64() emits MIME-chunked output (CRLF every 76 chars); a data
    URI must be a single unchunked token, so the line breaks are stripped
    (translate — still pure JVM codegen)."""
    return F.concat(
        F.lit(f"data:{mime};base64,"),
        F.translate(F.base64(col.cast("binary")), "\r\n", ""),
    )


def from_data_uri(col: Column) -> Column:
    """data URI → binary payload (inverse; mime prefix dropped)."""
    return F.unbase64(F.regexp_replace(col, r"^data:[^,]*,", ""))
