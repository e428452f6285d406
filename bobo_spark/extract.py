"""Byte-stable text extraction from HTML (Arrow-vectorized).

North-rule invariant: extraction must produce **byte-identical** text
per url on every run, partitioning, and parallelism level. The
extractor therefore uses only deterministic byte-level operations —
no locale-dependent parsing, no charset guessing: decode UTF-8
strictly, strip tags with a fixed regex, collapse whitespace with a
fixed pattern. (The sandbox generator wraps text in a fixed
``<html><body>…</body></html>`` envelope; the regex pipeline also
handles arbitrary simple markup deterministically.)

Reference parity: replaces Lucene's analyzed stored-text handling in
the reference's indexing path (bobo-browse/src/main/java/com/
browseengine/bobo/index/BoboIndexer.java:63-86) with a Spark-side
pandas UDF.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n\f\v]+")


def extract_text_bytes(html: bytes) -> bytes:
    """Pure function: html bytes -> extracted text bytes."""
    stripped = _TAG_RE.sub(b" ", html)
    collapsed = _WS_RE.sub(b" ", stripped).strip()
    return collapsed


def extract_series(html: pd.Series) -> pd.Series:
    """Batch extraction: Series[bytes] -> Series[str].

    The per-element work is two compiled-regex substitutions — no
    interpreted per-row Python logic.
    """
    return html.map(lambda b: extract_text_bytes(bytes(b)).decode("utf-8", errors="strict"))


def extract_text(col) -> Column:
    """Column expression: Arrow-vectorized pandas UDF over binary html."""
    udf = F.pandas_udf(extract_series, "string")
    return udf(col)
