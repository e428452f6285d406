"""search_many (batch query execution) must return results identical
to per-query search() across the reference query set."""

from __future__ import annotations

import pytest

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.oracle import reference_queryset
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import make_vocab, webpages


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_many"))
    build_snapshot(spark, webpages(spark, 1200, 6), d,
                   BuildConfig(docs_per_segment=200, block_size=64))
    return IndexReader(spark, d)


def test_batch_equals_single(reader):
    qs = reference_queryset(make_vocab(), n_conj=6, n_disj=6, n_lang=4, n_ts=4)
    reqs = [
        SearchRequest(query=q["query"], mode=q.get("mode", "and"), k=10,
                      facets=("lang",), selections=q.get("selections", {}),
                      ts_range=q.get("ts_range"))
        for q in qs
    ]
    reqs.append(SearchRequest(query=["zzznothing"], mode="and", k=5))  # unrunnable
    reqs.append(SearchRequest(query=["zzznothing", "ba"], mode="or", k=5))
    batch = reader.search_many(reqs)
    assert len(batch) == len(reqs)
    for req, got in zip(reqs, batch):
        single = reader.search(req)
        assert got.hits["doc_id"].tolist() == single.hits["doc_id"].tolist()
        assert got.hits["score"].tolist() == single.hits["score"].tolist()
        assert got.num_hits == single.num_hits
        for f in req.facets:
            a = dict(zip(got.facets[f]["value"], got.facets[f]["count"]))
            b = dict(zip(single.facets[f]["value"], single.facets[f]["count"]))
            assert a == b


def test_batch_prunes_like_single(reader):
    """Facet-less disjunctive queries: batch mode (which trades
    per-query block-max pruning for cross-query decode sharing) must
    stay exact vs solo pruned AND solo unpruned search()."""
    qs = reference_queryset(make_vocab(), n_conj=0, n_disj=8, n_lang=0, n_ts=0)
    reqs = [SearchRequest(query=q["query"], mode="or", k=10) for q in qs]
    batch = reader.search_many(reqs)
    for req, got in zip(reqs, batch):
        single = reader.search(req)
        exhaustive = reader.search(SearchRequest(
            query=req.query, mode="or", k=10, prune=False))
        for ref in (single, exhaustive):
            assert got.hits["doc_id"].tolist() == ref.hits["doc_id"].tolist()
            assert got.hits["score"].tolist() == ref.hits["score"].tolist()
            assert got.num_hits == ref.num_hits


def test_batch_phrase_and_matchall(reader):
    """Phrase queries share the batch task's full-frame decode (no
    conjunctive block skip in batch mode) and MatchAll requests route
    to the forward-scan path — both must equal their solo twins."""
    reqs = [
        SearchRequest(query="ba be", mode="phrase", k=10),
        SearchRequest(query=None, k=10, selections={"lang": ["en"]}),
        SearchRequest(query="ba be", mode="and", k=10),
        SearchRequest(query="ba", mode="phrase", k=10),
    ]
    batch = reader.search_many(reqs)
    for req, got in zip(reqs, batch):
        single = reader.search(req)
        assert got.hits["doc_id"].tolist() == single.hits["doc_id"].tolist()
        assert got.hits["score"].tolist() == single.hits["score"].tolist()
        assert got.num_hits == single.num_hits


def test_batch_explain_empty_result_matches_single(reader):
    # ADVICE r4: explain=True on a zero-hit query must return an empty
    # (doc_id, part, value) frame from BOTH paths, not None from batch
    req = SearchRequest(query=["zzznothing"], mode="and", k=5, explain=True)
    single = reader.search(req)
    batch = reader.search_many([req])[0]
    assert single.explanations is not None and len(single.explanations) == 0
    assert batch.explanations is not None and len(batch.explanations) == 0
    assert list(batch.explanations.columns) == list(single.explanations.columns)


def test_batch_distributed_path_equals_driver_cache_path(spark, tmp_path_factory):
    """search_many serves small indexes from the in-driver block cache
    (zero Spark jobs); an uncached reader must take the distributed
    batch and return identical results — this is the only coverage the
    distributed path gets now that every small test index is cached."""
    d = str(tmp_path_factory.mktemp("idx_many_nc"))
    build_snapshot(spark, webpages(spark, 800, 5), d,
                   BuildConfig(docs_per_segment=200, block_size=64))
    cached = IndexReader(spark, d)
    uncached = IndexReader(spark, d, cache=False)
    assert cached._postings_driver() is not None
    assert uncached._postings_driver() is None
    qs = reference_queryset(make_vocab(), n_conj=4, n_disj=4, n_lang=2, n_ts=2)
    reqs = [
        SearchRequest(query=q["query"], mode=q.get("mode", "and"), k=10,
                      facets=("lang",), selections=q.get("selections", {}),
                      ts_range=q.get("ts_range"))
        for q in qs
    ] + [SearchRequest(query="ba be", mode="phrase", k=10)]
    a = cached.search_many(reqs)
    b = uncached.search_many(reqs)
    for ra, rb in zip(a, b):
        assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
        assert ra.hits["score"].tolist() == rb.hits["score"].tolist()
        assert ra.num_hits == rb.num_hits
        for f in ra.facets:
            assert ra.facets[f].values.tolist() == rb.facets[f].values.tolist()
