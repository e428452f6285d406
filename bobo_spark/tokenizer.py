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


def term_freq_frame(doc_ids: np.ndarray, texts: pd.Series,
                    positions: bool = False) -> pd.DataFrame:
    """Vectorized per-batch term-frequency table.

    Returns columns (doc_id, term, tf, doclen[, pos_bytes]). Token
    counting happens through one C-path group over the exploded
    (doc, token) pairs — no per-row Python.

    With ``positions=True`` each row also carries ``pos_bytes``: the
    term's in-document token positions (0-based), delta-varbyte
    encoded (first position absolute, then gaps) — the per-posting
    positions stream that unlocks phrase search.
    """
    from .codecs import vb_encode_segmented

    toks = tokenize_batch(texts)
    doclens = toks.map(len).to_numpy(dtype=np.int64)
    flat_rows = np.repeat(doc_ids, doclens)
    if len(flat_rows) == 0:
        cols = {
            "doc_id": np.array([], dtype=np.int64),
            "term": np.array([], dtype=object),
            "tf": np.array([], dtype=np.int64),
            "doclen": np.array([], dtype=np.int64),
        }
        if positions:
            cols["pos_bytes"] = np.array([], dtype=object)
        return pd.DataFrame(cols)
    flat_toks = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy()])
    if not positions:
        pairs = pd.DataFrame({"doc_id": flat_rows, "term": flat_toks})
        tf = pairs.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        dl = pd.Series(doclens, index=doc_ids)
        tf["doclen"] = dl.loc[tf["doc_id"].to_numpy()].to_numpy()
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf
    # positions beyond 2^24-1 would carry into the doc_id bits of the
    # query engine's (doc<<24|pos) occurrence keys (query._POS_SHIFT)
    # and silently corrupt phrase matching — fail the build instead,
    # mirroring pack_meta's tf/lang/ts overflow checks. 64 tokens of
    # headroom keep phrase/section probe keys (pos + phrase_len) from
    # ever carrying into the doc bits either.
    if int(doclens.max()) >= (1 << 24) - 64:
        raise ValueError(
            f"document with {int(doclens.max())} tokens exceeds the "
            "2^24 position limit of the positional postings codec")
    # positions path: factorize terms to int codes, then one integer
    # lexsort by (doc, code) — a stable sort, so within each run the
    # original flat order (= ascending position order) survives.
    # (Sorting on the object-string key instead costs ~2× the whole
    # stage.) Runs become rows; one segmented varbyte encode covers
    # the batch.
    starts_per_doc = np.cumsum(doclens) - doclens
    pos = np.arange(flat_rows.size, dtype=np.int64) - np.repeat(starts_per_doc, doclens)
    codes, uniq = pd.factorize(flat_toks, sort=False)
    order = np.lexsort((codes, flat_rows))
    d, c, p = flat_rows[order], codes[order], pos[order]
    n = d.size
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, n))
    prev = np.empty_like(p)
    prev[0] = 0
    prev[1:] = p[:-1]
    deltas = np.where(new_run, p, p - prev).astype(np.uint64)
    buf, offs = vb_encode_segmented(deltas, run_starts)
    dl = pd.Series(doclens, index=doc_ids)
    run_docs = d[run_starts]
    return pd.DataFrame({
        "doc_id": run_docs,
        "term": np.asarray(uniq, dtype=object)[c[run_starts]],
        "tf": run_lens.astype(np.int64),
        "doclen": dl.loc[run_docs].to_numpy(),
        "pos_bytes": [buf[offs[i]:offs[i + 1]] for i in range(len(run_starts))],
    })


def section_starts_frame(doc_ids: np.ndarray, texts: pd.Series,
                         pattern: str) -> pd.DataFrame:
    """Per-doc section geometry for regex-delimited sections.

    Sections = the text split on ``pattern``; a section's start is the
    global token position of its first token. Returns (doc_id, n_secs,
    sec_bytes) with the starts delta-varbyte encoded (first start is
    always 0). Empty sections keep their ids (they simply never claim
    a position — occurrence mapping is searchsorted-right minus one).

    This is the per-DOC analogue of the reference's per-OCCURRENCE
    section payloads (search/section/TermNode.java:55-63,
    IntMetaDataQuery.java:20): boundaries are stored once per doc, and
    occurrence→section resolves at query time.
    """
    from .codecs import vb_encode_segmented

    parts = texts.str.split(pattern, regex=True)
    nparts = parts.map(len).to_numpy(np.int64)
    flat = parts.explode()
    cnt = flat.str.lower().str.count(TOKEN_RE.pattern).to_numpy(np.int64)
    doc_first = np.cumsum(nparts) - nparts  # index of each doc's first part
    g_end = np.cumsum(cnt)
    before_doc = np.concatenate(([0], g_end))[doc_first]
    starts = np.concatenate(([0], g_end[:-1])) - np.repeat(before_doc, nparts)
    prev = np.concatenate(([0], starts[:-1]))
    new_doc = np.zeros(starts.size, dtype=bool)
    new_doc[doc_first] = True
    deltas = np.where(new_doc, starts, starts - prev).astype(np.uint64)
    buf, offs = vb_encode_segmented(deltas, doc_first)
    return pd.DataFrame({
        "doc_id": np.asarray(doc_ids, dtype=np.int64),
        "n_secs": nparts.astype(np.int32),
        "sec_bytes": [buf[offs[i]:offs[i + 1]] for i in range(len(doc_first))],
    })
