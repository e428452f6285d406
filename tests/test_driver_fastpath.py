"""Driver fast path: queries whose total posting count (known exactly
from the dictionary df) is page-scale score on the driver — no
groupBy exchange, no Python-worker round trip. Results must be
IDENTICAL to the distributed path (same _segment_search per segment)."""

from __future__ import annotations

import pandas as pd
import pytest

from bobo_spark.build import BuildConfig, build_snapshot, delete_docs
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_fast"))
    build_snapshot(spark, webpages(spark, 900, 5), d,
                   BuildConfig(docs_per_segment=200, block_size=32))
    delete_docs(spark, d, [3, 7])
    return IndexReader(spark, d)


REQS = [
    SearchRequest(query="ba be", mode="and", k=10, facets=("lang",)),
    SearchRequest(query="ba ka vu", mode="or", k=10),
    SearchRequest(query="ba be", mode="phrase", k=10),
    SearchRequest(query="ka", mode="or", k=10, selections={"lang": ["en"]},
                  facets=("ts_bucket",)),
    SearchRequest(query="ba be", mode="or", k=5, explain=True),
]


def test_fastpath_equals_distributed(env):
    reader = env
    for req in REQS:
        plan = reader.plan(req)
        assert reader._driver_fastpath(plan), req  # small corpus: fast
        fast = reader.search(req)
        reader.DRIVER_POSTINGS_THRESHOLD = -1  # force distributed
        try:
            dist = reader.search(req)
        finally:
            del reader.DRIVER_POSTINGS_THRESHOLD  # back to class attr
        assert fast.hits["doc_id"].tolist() == dist.hits["doc_id"].tolist()
        assert fast.hits["score"].tolist() == dist.hits["score"].tolist()
        assert fast.num_hits == dist.num_hits
        assert set(fast.facets) == set(dist.facets)
        for f in fast.facets:
            pd.testing.assert_frame_equal(fast.facets[f], dist.facets[f])
        if req.explain:
            pd.testing.assert_frame_equal(fast.explanations,
                                          dist.explanations)


def test_fastpath_costs_postings_selections(env):
    reader = env
    # r6: postings-mode selections resolve their sentinel Σdf at plan
    # time (plan["sel_df"]), so the fast path is cost-gated on the
    # COMBINED posting volume — in-gate selections are served on the
    # driver, and a selection heavy enough to breach the gate declines
    plan = reader.plan(SearchRequest(query="ba", mode="or", k=5))
    assert reader._driver_fastpath(plan)
    plan["sel_lang_tids"] = [123]
    plan["sel_df"] = reader.DRIVER_POSTINGS_THRESHOLD + 1
    assert not reader._driver_fastpath(plan)


def test_section_fastpath_equals_distributed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_fast_sec"))
    build_snapshot(spark, webpages(spark, 600, 4), d,
                   BuildConfig(docs_per_segment=150, sections=("window", 8)))
    reader = IndexReader(spark, d)
    trees = [("and", ("term", "ba"), ("term", "be")),
             ("phrase", "ba be"),
             ("or", ("term", "ka"), ("and", ("term", "ba"),
                                     ("not", ("term", "vu"))))]
    for tree in trees:
        fast = reader.section_search(tree, k=30)
        reader.DRIVER_POSTINGS_THRESHOLD = -1
        try:
            dist = reader.section_search(tree, k=30)
        finally:
            del reader.DRIVER_POSTINGS_THRESHOLD
        assert fast.num_hits == dist.num_hits, tree
        pd.testing.assert_frame_equal(fast.hits, dist.hits)


def test_cached_fastpath_unknown_term_with_selection(env):
    """r6 regression: the in-driver block cache holds the pseudo
    forward runs (term_id = -1); an UNKNOWN query term (also -1) must
    not resolve to them (it would turn the candidate set into every
    doc). OR-mode query with one unknown term + a postings-mode
    selection must match the distributed path exactly."""
    reader = env
    req = SearchRequest(query=["ba", "zzznothing"], mode="or", k=10,
                        facets=("lang",), selections={"lang": ["fr"]})
    assert reader._postings_driver() is not None
    fast = reader.search(req)
    reader.DRIVER_POSTINGS_THRESHOLD = -1
    try:
        dist = reader.search(req)
    finally:
        del reader.DRIVER_POSTINGS_THRESHOLD
    assert fast.num_hits == dist.num_hits
    assert fast.hits["doc_id"].tolist() == dist.hits["doc_id"].tolist()
    assert fast.hits["score"].tolist() == dist.hits["score"].tolist()
    a = dict(zip(fast.facets["lang"]["value"], fast.facets["lang"]["count"]))
    b = dict(zip(dist.facets["lang"]["value"], dist.facets["lang"]["count"]))
    assert a == b
