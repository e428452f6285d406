"""segment_local build pipeline: one text shuffle instead of a
materialized pair table. Must be SEMANTICALLY identical to the classic
pairs pipeline — same term dictionary, same stats, same forward rows,
and identical query results (the posting block layout may differ:
blocks split at doc-range partition boundaries, which the reader's
block concatenation tolerates by design)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("v2")
    docs = webpages(spark, 900, 5)
    cfg_a = BuildConfig(docs_per_segment=200, block_size=32, pipeline="pairs",
                        sections=("window", 8))
    cfg_b = BuildConfig(docs_per_segment=200, block_size=32,
                        pipeline="segment_local", sections=("window", 8),
                        rows_per_posting_partition=20_000)
    build_snapshot(spark, docs, str(base / "a"), cfg_a)
    build_snapshot(spark, docs, str(base / "b"), cfg_b)
    return IndexReader(spark, str(base / "a")), IndexReader(spark, str(base / "b"))


def test_terms_identical(both):
    a, b = both
    ta = a._terms.toPandas().sort_values("term").reset_index(drop=True)
    tb = b._terms.toPandas().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(ta[["term", "term_id", "df", "cf"]],
                                  tb[["term", "term_id", "df", "cf"]])


def test_stats_identical(both):
    a, b = both
    for k in ("n_docs", "tok_sum", "avgdl", "n_terms"):
        assert a.snap.stats[k] == b.snap.stats[k], k


def test_forward_identical(both):
    a, b = both
    fa = a._forward.toPandas().sort_values("doc_id").reset_index(drop=True)
    fb = b._forward.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fa, fb[fa.columns])


def test_query_results_identical(both):
    a, b = both
    reqs = [
        SearchRequest(query="ba be", mode="and", k=10, facets=("lang",)),
        SearchRequest(query="ba ka vu", mode="or", k=10),
        SearchRequest(query="ba be", mode="phrase", k=10),
        SearchRequest(query="ka", mode="or", k=10,
                      selections={"lang": ["en"]}, facets=("ts_bucket",)),
        SearchRequest(query=None, k=10, selections={"lang": ["de"]}),
    ]
    for req in reqs:
        ra, rb = a.search(req), b.search(req)
        assert ra.num_hits == rb.num_hits, req
        pd.testing.assert_frame_equal(ra.hits, rb.hits)
        assert set(ra.facets) == set(rb.facets)
        for f in ra.facets:
            pd.testing.assert_frame_equal(ra.facets[f], rb.facets[f])


def test_section_search_identical(both):
    a, b = both
    tree = ("and", ("term", "ba"), ("not", ("term", "be")))
    ra, rb = a.section_search(tree, k=10), b.section_search(tree, k=10)
    assert ra.num_hits == rb.num_hits
    pd.testing.assert_frame_equal(ra.hits, rb.hits)


def test_v2_rejects_oversized_dictionary(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("v2big"))
    docs = webpages(spark, 100, 2)
    with pytest.raises(ValueError, match="broadcast_terms_threshold"):
        build_snapshot(spark, docs, d, BuildConfig(
            docs_per_segment=50, pipeline="segment_local",
            broadcast_terms_threshold=5))


def test_mixed_pipeline_incremental(spark, tmp_path_factory):
    """Snapshot 0 built with the classic pairs pipeline, snapshot 1
    appended with segment_local: the merged index must answer queries
    identically to a single-shot build of the full corpus."""
    base = tmp_path_factory.mktemp("v2mix")
    docs = webpages(spark, 600, 4)
    half = 300
    d_mix = str(base / "mix")
    build_snapshot(spark, docs.where(F.col("doc_id") < half), d_mix,
                   BuildConfig(docs_per_segment=150, pipeline="pairs"))
    build_snapshot(spark, docs.where(F.col("doc_id") >= half), d_mix,
                   BuildConfig(docs_per_segment=150, pipeline="segment_local"))
    d_full = str(base / "full")
    build_snapshot(spark, docs, d_full, BuildConfig(docs_per_segment=150))
    a, b = IndexReader(spark, d_mix), IndexReader(spark, d_full)
    assert a.n_docs == b.n_docs and abs(a.avgdl - b.avgdl) < 1e-9
    for req in (SearchRequest(query="ba be", mode="and", k=10, facets=("lang",)),
                SearchRequest(query="ka vu", mode="or", k=10),
                SearchRequest(query=None, k=10, selections={"lang": ["en"]})):
        ra, rb = a.search(req), b.search(req)
        assert ra.num_hits == rb.num_hits
        pd.testing.assert_frame_equal(ra.hits, rb.hits)


def test_v2_empty_text_docs(spark, tmp_path_factory):
    """Docs with empty text must still land in forward (doclen 0) and
    be reachable via MatchAll, without breaking the encoder."""
    d = str(tmp_path_factory.mktemp("v2empty"))
    pdf = pd.DataFrame({
        "doc_id": range(20),
        "url": [f"u{i}" for i in range(20)],
        "warc_ts": pd.Timestamp("2024-03-01"),
        "lang": "en",
        "text": ["" if i % 3 == 0 else f"alpha beta doc {i}" for i in range(20)],
    })
    docs = spark.createDataFrame(pdf)
    build_snapshot(spark, docs, d, BuildConfig(
        docs_per_segment=10, pipeline="segment_local"))
    r = IndexReader(spark, d)
    fwd = r._forward.toPandas().set_index("doc_id")["doclen"]
    assert len(fwd) == 20
    assert all(fwd[i] == 0 for i in range(0, 20, 3))
    res = r.search(SearchRequest(query=None, k=25))
    assert res.num_hits == 20
    res2 = r.search(SearchRequest(query="alpha", mode="and", k=25))
    assert res2.num_hits == 20 - len(range(0, 20, 3))


def test_regex_sections_identical_both_pipelines(spark, tmp_path_factory):
    """Regex section geometry (the cogrouped boundary table) must come
    out identical from the classic pairs pipeline and segment_local —
    both share _encode_partition, but the sections table is written by
    a separate stage whose inputs differ per pipeline."""
    import numpy as np

    base = tmp_path_factory.mktemp("v2rx")
    rows = []
    words = ["ba", "be", "ka", "vu", "ma", "ne"]
    rng = np.random.RandomState(11)
    for i in range(240):
        parts = [" ".join(rng.choice(words, size=rng.randint(0, 8)))
                 for _ in range(rng.randint(1, 5))]
        rows.append((i, f"u{i}", "2024-01-0%d" % (i % 9 + 1), "en",
                     "\n\n".join(parts)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "url", "warc_ts", "lang",
                                      "text"])
    docs = spark.createDataFrame(pdf).withColumn(
        "warc_ts", F.to_timestamp("warc_ts"))
    readers = []
    for sub, pipe in (("a", "pairs"), ("b", "segment_local")):
        d = str(base / sub)
        build_snapshot(spark, docs, d, BuildConfig(
            docs_per_segment=80, block_size=16, pipeline=pipe,
            sections=("regex", r"\n\n+")))
        readers.append(IndexReader(spark, d))
    a, b = readers
    for tree in (
        ("and", ("term", "ba"), ("term", "be")),
        ("and", ("term", "ba"), ("not", ("term", "ka"))),
        ("phrase", "ba be"),
        ("or", ("phrase", "ka vu"), ("and", ("term", "ma"),
                                     ("term", "ne"))),
    ):
        ra, rb = a.section_search(tree, k=50), b.section_search(tree, k=50)
        assert ra.num_hits == rb.num_hits, tree
        pd.testing.assert_frame_equal(ra.hits, rb.hits)


def test_assign_sorted_ids_driver_equals_distributed(spark):
    """r6: assign_sorted_ids gained a driver-sort path for
    dictionaries under the exact row-count gate; the distributed
    two-pass rank must assign the SAME (term -> id) mapping."""
    from bobo_spark.build import assign_sorted_ids

    rows = [(f"t{i:04d}", i % 7 + 1, i % 11 + 1) for i in range(997)]
    df = spark.createDataFrame(rows, "term string, df long, cf long")
    drv = assign_sorted_ids(df, spark, id_base=5).toPandas()
    dist = assign_sorted_ids(df, spark, id_base=5,
                             driver_threshold=0).toPandas()
    a = drv.sort_values("term", ignore_index=True)
    b = dist.sort_values("term", ignore_index=True)
    assert a["term"].tolist() == b["term"].tolist()
    assert a["term_id"].tolist() == b["term_id"].tolist()
    assert a["term_id"].tolist() == list(range(5, 5 + len(rows)))
