"""Property test: block-max pruned disjunctive top-k must be EXACTLY
the exhaustive top-k (docIDs and float64 scores)."""

from __future__ import annotations

import pytest

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.oracle import reference_queryset
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import make_vocab, webpages


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_prune"))
    build_snapshot(spark, webpages(spark, 1500, 6), d,
                   BuildConfig(docs_per_segment=250, block_size=32))
    return IndexReader(spark, d)


def test_pruned_equals_exhaustive(reader):
    vocab = make_vocab()
    qs = reference_queryset(vocab, n_conj=0, n_disj=12, n_lang=0, n_ts=0)
    qs.append({"query": ["ba", "be", "bi"], "mode": "or"})  # head-heavy
    qs.append({"query": ["ba", vocab[4000]], "mode": "or"})  # head+tail
    pruned_nonempty = 0
    for q in qs:
        a = reader.search(SearchRequest(query=q["query"], mode="or", k=10, prune=True))
        b = reader.search(SearchRequest(query=q["query"], mode="or", k=10, prune=False))
        assert a.hits["doc_id"].tolist() == b.hits["doc_id"].tolist(), q
        assert a.hits["score"].tolist() == b.hits["score"].tolist(), q
        assert a.num_hits == b.num_hits, q  # exact count survives pruning
        pruned_nonempty += len(a.hits) > 0
    assert pruned_nonempty > 5
