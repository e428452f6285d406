"""Deterministic Common-Crawl-style web-page table generator (Fixture B).

Produces the driver-mandated input shape
``(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)``
plus a ``doc_id`` key. Every column is a pure function of the row index
``i`` (counter-based hashing, no RNG state), so the table is
byte-identical for any partitioning, parallelism level, or re-run —
this is what makes the extraction/rank-identity invariants testable.

Token distribution is Zipf(s=1.1) over a ~30k-word synthetic vocabulary
(inverse-CDF sampling), so head terms ("the"-like) exercise the
skew/salting path of the index build.

Reference parity: replaces the reference's in-RAM fixture data feed
(bobo-browse/src/test/.../BoboTestCase.java:185-255) with a scalable
generator of the driver's input_hint schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

VOCAB_SIZE = 30_000
ZIPF_S = 1.1
MIN_TOKENS, MAX_TOKENS = 20, 200
N_HOSTS = 1000
BASE_TS = np.datetime64("2024-01-01T00:00:00")
TS_WRAP_SECONDS = 180 * 86400  # ~180 days
LANGS = ["en", "de", "fr", "es", "pt", "it", "nl"]
LANG_PROBS = [0.6, 0.1, 0.1, 0.08, 0.05, 0.04, 0.03]
SEED = 42

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash: uint64 -> uint64 (SplitMix64 finalizer)."""
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _uniform01(counter: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic U[0,1) per counter value for a named stream."""
    h = _splitmix64(counter.astype(_U64) * _U64(0x9E3779B1) + _U64(stream * 0xDEADBEEF + SEED))
    return (h >> _U64(11)).astype(np.float64) * (1.0 / (1 << 53))


_SYL = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu",
]


def make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Synthetic vocabulary: word k = syllables of k in base-50.

    Distinct, lowercase-alpha, tokenizer-stable. Rank order = Zipf rank
    (word 0 is the most frequent, the stopword analogue).
    """
    words = []
    for k in range(size):
        w, n = [], k
        while True:
            w.append(_SYL[n % 50])
            n //= 50
            if n == 0:
                break
        words.append("".join(reversed(w)))
    return words


def zipf_cdf(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    return np.cumsum(p)


def gen_batch(indices: np.ndarray, vocab: np.ndarray, cdf: np.ndarray) -> pd.DataFrame:
    """Generate rows for the given row indices — fully vectorized."""
    i = indices.astype(np.int64)
    n = len(i)
    # token counts
    n_tok = (MIN_TOKENS + (_splitmix64(i.astype(_U64)) % _U64(MAX_TOKENS - MIN_TOKENS + 1)).astype(np.int64))
    total = int(n_tok.sum())
    row_of_tok = np.repeat(np.arange(n), n_tok)
    # per-token counter: (row_index << 12 | token_pos) is unique for pos < 4096
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    pos = np.arange(total) - np.repeat(starts, n_tok)
    ctr = (i[row_of_tok].astype(_U64) << _U64(12)) | pos.astype(_U64)
    u = _uniform01(ctr, stream=1)
    word_idx = np.searchsorted(cdf, u, side="right")
    toks = vocab[word_idx]
    # join per row
    texts = []
    bound = np.concatenate((starts, [total]))
    for r in range(n):
        texts.append(" ".join(toks[bound[r]:bound[r + 1]]))
    # lang
    lp = np.cumsum(np.array(LANG_PROBS))
    lang_idx = np.searchsorted(lp, _uniform01(i.astype(_U64), stream=2), side="right")
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)
    langs = np.array(LANGS)[lang_idx]
    # timestamps
    ts = BASE_TS + ((i * 37) % TS_WRAP_SECONDS).astype("timedelta64[s]")
    urls = [f"https://site{int(x) % N_HOSTS}.example/p/{int(x)}" for x in i]
    htmls = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]
    return pd.DataFrame(
        {
            "doc_id": i,
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


WEBPAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def webpages(spark: SparkSession, n_rows: int, n_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of the webpages table.

    ``spark.range`` supplies row indices; generation happens inside
    ``mapInPandas`` with vectorized numpy (no per-row Python beyond the
    final string join, which is unavoidable for variable-length text).
    """
    if n_partitions is None:
        n_partitions = max(8, spark.sparkContext.defaultParallelism)
    vocab = np.array(make_vocab(), dtype=object)
    cdf = zipf_cdf()

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_batch(pdf["id"].to_numpy(), vocab, cdf)

    rng = spark.range(0, n_rows, 1, n_partitions)
    return rng.mapInPandas(gen, schema=WEBPAGE_SCHEMA)
