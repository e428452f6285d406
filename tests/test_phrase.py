"""Phrase search: positional postings must reproduce a brute-force
token-scan reference exactly (docIDs AND float64 scores), incl. 2- and
3-term phrases, repeated-term phrases, and phrase + facet requests.

Reference parity: BrowseRequest accepts arbitrary Lucene queries incl.
PhraseQuery (api/BrowseRequest.java:315-327); scoring pins Lucene's
PhraseQuery shape (freq = phrase occurrences, idf summed over token
instances).
"""

from __future__ import annotations

import collections
import math

import pytest

from bobo_spark.bm25 import B, K1
from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.tokenizer import tokenize
from bobo_spark.webgen import webpages


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_phrase"))
    docs = webpages(spark, 1000, 5)
    build_snapshot(spark, docs, d, BuildConfig(docs_per_segment=250, block_size=32))
    toks = {r["doc_id"]: tokenize(r["text"])
            for r in docs.select("doc_id", "text").collect()}
    return IndexReader(spark, d), toks


def brute_phrase(toks: dict, phrase: str, k: int = 10):
    terms = phrase.split()
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in set(terms)}
    idf_sum = 0.0
    for t in terms:
        idf_sum += math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
    out = []
    for d, tk in toks.items():
        ptf = sum(1 for i in range(len(tk) - len(terms) + 1)
                  if tk[i:i + len(terms)] == terms)
        if ptf:
            s = idf_sum * (ptf * (K1 + 1)) / (
                ptf + K1 * (1 - B + B * len(tk) / avgdl))
            out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out, len(out)


def check(reader, toks, phrase):
    res = reader.search(SearchRequest(query=phrase, mode="phrase", k=10))
    ref, total = brute_phrase(toks, phrase)
    assert res.hits["doc_id"].tolist() == [d for d, _ in ref[:10]], phrase
    for got, (_, want) in zip(res.hits["score"].tolist(), ref[:10]):
        assert got == pytest.approx(want, abs=1e-12), phrase
    assert res.num_hits == total, phrase
    return total


def test_phrase_rank_identity(env):
    reader, toks = env
    bigrams = collections.Counter()
    for tk in toks.values():
        for i in range(len(tk) - 1):
            bigrams[(tk[i], tk[i + 1])] += 1
    nonzero = 0
    for (a, b), _ in bigrams.most_common(6):
        nonzero += check(reader, toks, f"{a} {b}") > 0
    assert nonzero >= 4


def test_phrase_trigram_and_repeat(env):
    reader, toks = env
    tri = collections.Counter()
    for tk in toks.values():
        for i in range(len(tk) - 2):
            tri[(tk[i], tk[i + 1], tk[i + 2])] += 1
    hits = 0
    for t3, _ in tri.most_common(4):
        hits += check(reader, toks, " ".join(t3)) > 0
    assert hits >= 2
    # repeated term ("x x")
    dup = collections.Counter()
    for tk in toks.values():
        for i in range(len(tk) - 1):
            if tk[i] == tk[i + 1]:
                dup[tk[i]] += 1
    if dup:
        w = dup.most_common(1)[0][0]
        check(reader, toks, f"{w} {w}")


def test_phrase_absent_and_single(env):
    reader, toks = env
    res = reader.search(SearchRequest(query="zzzq qqzz", mode="phrase", k=5))
    assert res.num_hits == 0 and len(res.hits) == 0
    # single-token phrase == term query with positional tf
    some = next(iter(toks.values()))[0]
    check(reader, toks, some)


def test_phrase_with_selection_and_facets(env):
    reader, toks = env
    bigrams = collections.Counter()
    for tk in toks.values():
        for i in range(len(tk) - 1):
            bigrams[(tk[i], tk[i + 1])] += 1
    (a, b), _ = bigrams.most_common(1)[0]
    res = reader.search(SearchRequest(query=f"{a} {b}", mode="phrase", k=5,
                                      facets=("lang",)))
    assert len(res.hits) <= 5
    assert int(res.facets["lang"]["count"].sum()) == res.num_hits


def test_phrase_on_positionless_index_raises_on_driver(spark, tmp_path_factory):
    """A v1 (store_positions=False) index must reject phrase queries
    with a clear driver-side ValueError, not an executor KeyError."""
    d = str(tmp_path_factory.mktemp("idx_nopos"))
    docs = webpages(spark, 120, 2)
    build_snapshot(spark, docs, d,
                   BuildConfig(docs_per_segment=60, store_positions=False))
    reader = IndexReader(spark, d)
    q = SearchRequest(query="ba be", mode="phrase", k=5)
    with pytest.raises(ValueError, match="store_positions=False"):
        reader.search(q)
    with pytest.raises(ValueError, match="store_positions=False"):
        reader.search_many([q])
