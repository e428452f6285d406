"""Recency boost (quadratic decay, ≙ query/RecencyBoostScorerBuilder
.java:15,40,58-60), numGroups (≙ sort/SortCollectorImpl.java:189-190),
and the collectAll zero-scan shortcut (≙ facets/impl/
SimpleFacetHandler.java:222-225)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.facets import (BoboBrowser, BrowseRequest, BrowseSelection,
                               FacetSpec, SimpleFacetHandler)
from bobo_spark.facets.browse import recency_boost_col
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages

NOW_MS = 1719792000000  # 2024-07-01T00:00:00Z
CUTOFF_MS = 90 * 86400000
MAXF = 2.0


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_rec"))
    docs = webpages(spark, 800, 4)
    build_snapshot(spark, docs, d, BuildConfig(docs_per_segment=200))
    buckets = {r["doc_id"]: r["b"] for r in docs.select(
        "doc_id",
        F.unix_millis(F.date_trunc("day", F.col("warc_ts").cast("timestamp"))).alias("b"),
    ).collect()}
    return IndexReader(spark, d), buckets


def test_recency_matches_reference_formula(env):
    reader, buckets = env
    # "now" just past the corpus: the decay window must hit real docs
    now = max(buckets.values()) + 86400000
    cutoff = 30 * 86400000
    req = dict(query=["ba", "be"], mode="or", k=400)
    raw = reader.search(SearchRequest(**req))
    boosted = reader.search(SearchRequest(
        **req, recency={"now_ms": now, "cutoff_ms": cutoff, "max_factor": MAXF}))
    assert raw.num_hits == boosted.num_hits
    raw_scores = dict(zip(raw.hits["doc_id"], raw.hits["score"]))

    def f(bucket_ms):
        x = float(now - bucket_ms)
        mx = MAXF + 1.0
        return 1.0 if x > cutoff else (1.0 - mx) / (float(cutoff) ** 2) * x * x + mx

    n_boosted = 0
    for d, s in zip(boosted.hits["doc_id"], boosted.hits["score"]):
        want = raw_scores[d] * f(buckets[d])
        assert s == pytest.approx(want, rel=1e-12), d
        n_boosted += f(buckets[d]) > 1.0
    assert n_boosted > 0  # the window actually boosts something


def test_browse_num_groups(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", "red" if i % 2 else "blue") for i in range(20)],
        "id long, grp string, color string")
    b = BoboBrowser(df, [SimpleFacetHandler("color")], doc_col="id")
    req = BrowseRequest(count=5, group_by="grp")
    req.add_selection(BrowseSelection("color", values=["red"]))
    res = b.browse(req)
    assert res.num_hits == 10
    assert res.num_groups == 3
    # no group_by -> num_groups == num_hits
    req2 = BrowseRequest(count=5)
    req2.add_selection(BrowseSelection("color", values=["red"]))
    assert b.browse(req2).num_groups == 10


def test_browse_recency_scorer_builder(spark):
    df = spark.createDataFrame(
        [(1, NOW_MS - 1000), (2, NOW_MS - CUTOFF_MS - 1000), (3, NOW_MS)],
        "id long, tms long")
    b = BoboBrowser(df, [SimpleFacetHandler("id")], doc_col="id")
    req = BrowseRequest(count=3, scorer_builders=[
        recency_boost_col("tms", NOW_MS, CUTOFF_MS, MAXF)])
    page = {r["id"]: r["_score"] for r in b.hits_page_df(req).collect()}
    assert page[2] == 1.0  # beyond cutoff
    assert page[3] == MAXF + 1.0  # x = 0 -> max
    assert 1.0 < page[1] < MAXF + 1.0


def test_collectall_zero_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = BoboBrowser(docs, [SimpleFacetHandler("lang")], doc_col="doc_id")
    req = BrowseRequest()
    req.set_facet_spec("lang", FacetSpec(order_by="hits"))
    first = b.facet_counts_df(req, "lang").toPandas()
    again = b.facet_counts_df(req, "lang")
    plan = again._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan[:500]  # served from the cache
    pd.testing.assert_frame_equal(first, again.toPandas())
    want = dict((r["lang"], r["count"]) for r in
                docs.groupBy("lang").count().collect())
    assert dict(zip(first["value"], first["count"])) == want


def test_index_collectall_counts(env, spark):
    reader, _ = env
    got = dict(zip(*[reader.facet_counts("lang")[c] for c in ("value", "count")]))
    fwd = spark.read.parquet(*reader.catalog.table_paths(reader.snap, "forward"))
    d = reader.dicts["lang"].set_index("ordinal")["value"]
    want = {d[k]: v for k, v in
            fwd.groupBy("lang_ord").count().toPandas().set_index("lang_ord")["count"].items()}
    assert got == want


def test_collectall_cache_not_poisoned_by_min_hits(spark, sf_dir):
    """A min_hits=1 unfiltered browse must not poison the cache for a
    later min_hits=0 request (which needs the zero-count universe)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # lang value "zz" exists only in this synthetic corpus column copy:
    # fabricate one by filtering a value out of the hit set is not
    # possible unfiltered — instead compare the two spec variants
    # directly: counts(min_hits=0) must include every distinct value
    # even right after a min_hits=1 browse warmed the cache.
    b = BoboBrowser(docs, [SimpleFacetHandler("lang")], doc_col="doc_id")
    req1 = BrowseRequest()
    req1.set_facet_spec("lang", FacetSpec(order_by="hits", min_hits=1))
    n1 = b.facet_counts_df(req1, "lang").count()
    req0 = BrowseRequest()
    req0.set_facet_spec("lang", FacetSpec(order_by="hits", min_hits=0))
    n0 = b.facet_counts_df(req0, "lang").count()
    want = docs.select("lang").distinct().count()
    assert n0 == want and n1 <= n0
    # and the cached replay for each spec stays self-consistent
    assert b.facet_counts_df(req0, "lang").count() == n0
    assert b.facet_counts_df(req1, "lang").count() == n1
