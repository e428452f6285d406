"""Soft deletes (≙ BoboTestCase.java:2142-2195 testBrowseWithDeletes:
delete docs, reopen, hits/counts exclude them; Lucene semantics — df
and avgdl statistics unchanged until merge)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bobo_spark.build import BuildConfig, build_snapshot, delete_docs
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_del"))
    docs = webpages(spark, 500, 3)
    build_snapshot(spark, docs, d, BuildConfig(
        docs_per_segment=125, sections=("window", 8)))
    before = IndexReader(spark, d)
    res = before.search(SearchRequest(query="ba", mode="or", k=20,
                                      facets=("lang",)))
    victims = [int(x) for x in res.hits["doc_id"][:3]]
    delete_docs(spark, d, victims)
    after = IndexReader(spark, d)  # reopen sees the tombstones
    return spark, d, docs, before, after, victims


def test_hits_and_counts_exclude_deleted(env):
    spark, d, docs, before, after, victims = env
    req = SearchRequest(query="ba", mode="or", k=20, facets=("lang",))
    a = after.search(req)
    assert not set(victims) & set(a.hits["doc_id"])
    b = before.search(req)
    assert a.num_hits == b.num_hits - len(victims)
    # facet counts drop exactly the victims' lang values
    langs = {r["doc_id"]: r["lang"] for r in
             docs.where(F.col("doc_id").isin(victims)).collect()}
    # victims all matched 'ba'; count deltas per lang value
    delta = {}
    for v in victims:
        delta[langs[v]] = delta.get(langs[v], 0) + 1
    am = dict(zip(a.facets["lang"]["value"], a.facets["lang"]["count"]))
    bm = dict(zip(b.facets["lang"]["value"], b.facets["lang"]["count"]))
    for k in bm:
        assert am.get(k, 0) == bm[k] - delta.get(k, 0), k


def test_stats_unchanged_until_merge(env):
    _, _, _, before, after, victims = env
    # Lucene semantics: df/avgdl/n_docs stats keep counting tombstoned
    # docs until a merge (scores of surviving docs are unchanged)
    assert after.n_docs == before.n_docs
    assert after.avgdl == before.avgdl
    req = SearchRequest(query="ba be", mode="and", k=10)
    a, b = after.search(req), before.search(req)
    surv = b.hits[~b.hits["doc_id"].isin(victims)]
    sa = dict(zip(a.hits["doc_id"], a.hits["score"]))
    for d_, s in zip(surv["doc_id"], surv["score"]):
        if d_ in sa:
            assert sa[d_] == s


def test_matchall_and_sections_exclude_deleted(env):
    spark, d, docs, before, after, victims = env
    ma = after.search(SearchRequest(query=None, k=10**6))
    assert ma.num_hits == docs.count() - len(victims)
    assert not set(victims) & set(ma.hits["doc_id"])
    fa = after.facet_counts("lang")
    want = dict((r["lang"], r["count"]) for r in
                docs.where(~F.col("doc_id").isin(victims))
                .groupBy("lang").count().collect())
    assert dict(zip(fa["value"], fa["count"])) == want
    sec_b = before.section_search(("term", "ba"), k=10**6)
    sec_a = after.section_search(("term", "ba"), k=10**6)
    assert set(sec_b.hits["doc_id"]) - set(sec_a.hits["doc_id"]) == set(victims)


def test_delete_is_snapshot_scoped(env):
    spark, d, docs, before, after, victims = env
    # time travel: the pre-delete snapshot still sees every doc
    old = IndexReader(spark, d, snapshot_id=before.snap.snapshot_id)
    res = old.search(SearchRequest(query="ba", mode="or", k=20))
    assert set(victims) <= set(
        IndexReader(spark, d, snapshot_id=before.snap.snapshot_id)
        .search(SearchRequest(query="ba", mode="or", k=10**6)).hits["doc_id"])
    assert after.snap.stats["n_deleted"] == len(victims)
