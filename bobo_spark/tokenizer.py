"""Deterministic tokenizer — the analyzer of the engine.

Replaces the reference's Lucene ``StandardAnalyzer`` (bobo-browse/src/
main/java/com/browseengine/bobo/index/BoboIndexer.java:63-65) with a
fixed, locale-independent rule: NFC-free ASCII-safe lowercasing via
``str.lower()`` (Unicode default casing, never locale-dependent) and
token extraction with the fixed pattern ``[a-z0-9]+``.

The same pure-Python function drives both the Spark build (wrapped in
an Arrow-vectorized pandas UDF) and the rank-identity oracle, so token
streams are identical by construction.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Canonical token stream for one document (oracle + engine)."""
    return TOKEN_RE.findall(text.lower())


def term_freqs(text: str) -> dict[str, int]:
    return dict(Counter(tokenize(text)))


def tokenize_batch(texts: pd.Series) -> pd.Series:
    """Vectorized batch tokenization: Series[str] -> Series[list[str]]."""
    return texts.str.lower().str.findall(TOKEN_RE)


def term_freq_frame(doc_ids: np.ndarray, texts: pd.Series) -> pd.DataFrame:
    """Vectorized per-batch term-frequency table.

    Returns columns (doc_id, term, tf, doclen). Token counting happens
    through a single pandas ``value_counts`` over the exploded
    (doc, token) pairs — C-path group counting, no per-row Python.
    """
    toks = tokenize_batch(texts)
    doclens = toks.map(len).to_numpy(dtype=np.int64)
    flat_rows = np.repeat(doc_ids, doclens)
    if len(flat_rows) == 0:
        return pd.DataFrame(
            {
                "doc_id": np.array([], dtype=np.int64),
                "term": np.array([], dtype=object),
                "tf": np.array([], dtype=np.int64),
                "doclen": np.array([], dtype=np.int64),
            }
        )
    flat_toks = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy()])
    pairs = pd.DataFrame({"doc_id": flat_rows, "term": flat_toks})
    tf = pairs.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    dl = pd.Series(doclens, index=doc_ids)
    tf["doclen"] = dl.loc[tf["doc_id"].to_numpy()].to_numpy()
    tf["tf"] = tf["tf"].astype(np.int64)
    return tf
