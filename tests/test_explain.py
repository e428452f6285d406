"""Score explanations (≙ BrowseHit.getExplanation,
api/BrowseHit.java:271-282): per-hit per-term BM25 contributions that
reproduce the hit score BIT-EXACTLY when summed in the engine's
pinned ascending-lex term order and multiplied by the recency
factor."""

from __future__ import annotations

import numpy as np
import pytest

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_expl"))
    build_snapshot(spark, webpages(spark, 700, 4), d,
                   BuildConfig(docs_per_segment=175))
    return IndexReader(spark, d)


def _check_exact(res, with_recency=False):
    assert res.explanations is not None and len(res.explanations)
    for d, s in zip(res.hits["doc_id"], res.hits["score"]):
        ex = res.explanations[res.explanations["doc_id"] == d]
        fac = 1.0
        if with_recency:
            b = ex[ex["part"] == "recency_boost"]
            assert len(b) == 1
            fac = float(b["value"].iloc[0])
            ex = ex[ex["part"] != "recency_boost"]
        # ascending part order == the engine's pinned accumulation order
        total = np.float64(0.0)
        for v in ex.sort_values("part")["value"]:
            total += np.float64(v)
        assert float(total * fac) == s, d


@pytest.mark.parametrize("mode", ["and", "or"])
def test_explanations_reproduce_scores(reader, mode):
    res = reader.search(SearchRequest(query="ba be", mode=mode, k=10,
                                      explain=True))
    assert len(res.hits)
    _check_exact(res)


def test_explanations_with_recency(reader):
    import pandas as pd

    d = reader.dicts["ts_bucket"]
    now_ms = int(pd.to_datetime(d["value"], utc=True).astype("int64").max()
                 // 1_000_000) + 86400000
    rec = {"now_ms": now_ms, "cutoff_ms": 60 * 86400000, "max_factor": 2.0}
    res = reader.search(SearchRequest(query="ba be", mode="or", k=10,
                                      recency=rec, explain=True))
    assert len(res.hits)
    _check_exact(res, with_recency=True)


def test_explanations_phrase(reader):
    res = reader.search(SearchRequest(query="ba be", mode="phrase", k=10,
                                      explain=True))
    if not len(res.hits):
        pytest.skip("no phrase matches in fixture")
    for d, s in zip(res.hits["doc_id"], res.hits["score"]):
        ex = res.explanations[res.explanations["doc_id"] == d]
        assert ex["part"].tolist() == ["phrase"]
        assert float(ex["value"].iloc[0]) == s


def test_explain_off_by_default(reader):
    res = reader.search(SearchRequest(query="ba be", mode="or", k=5))
    assert res.explanations is None


def test_batch_explanations_match_single(reader):
    reqs = [SearchRequest(query="ba be", mode="or", k=5, explain=True),
            SearchRequest(query="ba be", mode="and", k=5)]
    batch = reader.search_many(reqs)
    single = reader.search(reqs[0])
    import pandas as pd
    pd.testing.assert_frame_equal(batch[0].explanations,
                                  single.explanations)
    assert batch[1].explanations is None
