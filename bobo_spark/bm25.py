"""BM25 scoring primitives (k1=1.2, b=0.75) shared by build, query, oracle.

Replaces the reference's delegation to Lucene's TF-IDF scorer
(bobo-browse/src/main/java/com/browseengine/bobo/search/
BoboSearcher.java:242-247) with an explicit BM25 whose accumulation
order is pinned (ascending term_id, float64) so distributed scoring is
rank- AND score-identical to the pure-Python oracle.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(df, n_docs: int):
    """Robertson-Sparck-Jones idf with +1 floor (Lucene BM25 form).

    Scalars go through ``math.log`` — numpy's vectorized log can differ
    from libm by 1 ulp, which would break exact score identity with the
    pure-Python oracle. Array input (non-identity-critical callers)
    uses ``np.log``.
    """
    if np.ndim(df) == 0:
        return math.log(1.0 + (n_docs - float(df) + 0.5) / (float(df) + 0.5))
    return np.log(1.0 + (n_docs - df + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def contrib(tf, doclen, idf_t, avgdl: float):
    """Per-(term,doc) BM25 contribution, vectorized float64."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doclen, dtype=np.float64)
    return idf_t * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def contrib_scalar(tf: int, doclen: int, df: int, n_docs: int, avgdl: float) -> float:
    i = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return i * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * doclen / avgdl))
