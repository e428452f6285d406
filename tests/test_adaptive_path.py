"""Adaptive access-path choice (≙ AdaptiveFacetFilter): selective
selections route through facet-value posting lists, unselective ones
through the per-posting ordinal stream — identical results either way,
both rank-identical to the oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bobo_spark.build import BuildConfig, build_snapshot
from bobo_spark.oracle import OracleIndex
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.webgen import webpages

N = 1500


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_adaptive"))
    build_snapshot(spark, webpages(spark, N, 6), d,
                   BuildConfig(docs_per_segment=250, block_size=64))
    return IndexReader(spark, d)


@pytest.fixture(scope="module")
def oracle(spark):
    pdf = (
        webpages(spark, N, 6)
        .select("doc_id", "text", "lang",
                F.date_format(F.date_trunc("day", "warc_ts"), "yyyy-MM-dd")
                .alias("ts_bucket"))
        .toPandas()
    )
    return OracleIndex(pdf.to_dict("records"))


def test_path_choice(reader):
    selective = reader.plan(SearchRequest(query="ba", selections={"lang": ["nl"]}))
    assert selective["sel_lang_mode"] == "postings"
    assert len(selective["sel_lang_tids"]) == 1
    broad = reader.plan(SearchRequest(query="ba", selections={"lang": ["en"]}))
    assert broad["sel_lang_mode"] == "ords"  # 60% of docs: 2*df >= n
    wide_ts = reader.plan(SearchRequest(query="ba", ts_range=("2024-01-01", "2024-03-01")))
    assert wide_ts["sel_ts_mode"] == "ords"  # > 5 buckets


def test_both_paths_match_oracle(reader, oracle):
    for sel in ({"lang": ["nl"]}, {"lang": ["en"]}, {"lang": ["de", "fr"]}):
        for mode in ("and", "or"):
            req = SearchRequest(query=["ba", "keri"], mode=mode, k=10,
                                facets=("lang",), selections=sel)
            got = reader.search(req)
            exp = oracle.search(["ba", "keri"], mode=mode, k=10,
                                facets=("lang",), selections=sel)
            assert got.hits["doc_id"].tolist() == [d for d, _ in exp["hits"]], (sel, mode)
            assert got.hits["score"].tolist() == [s for _, s in exp["hits"]], (sel, mode)
            assert got.num_hits == exp["num_hits"]
            assert dict(zip(got.facets["lang"]["value"],
                            got.facets["lang"]["count"])) == exp["facets"]["lang"]


def test_ts_selection_paths(reader, oracle):
    # at 1500 docs the generator's timestamps all land on one day:
    # that bucket covers every doc -> ords path (2*df >= n)
    req = SearchRequest(query=["ba"], mode="or", k=10, ts_range=("2024-01-01", "2024-01-01"))
    plan = reader.plan(req)
    assert plan["sel_ts_mode"] == "ords"
    got = reader.search(req)
    exp = oracle.search(["ba"], mode="or", k=10, ts_range=("2024-01-01", "2024-01-01"))
    assert got.hits["doc_id"].tolist() == [d for d, _ in exp["hits"]]
    assert got.num_hits == exp["num_hits"]
    # empty bucket range -> zero hits, either path
    empty = reader.search(SearchRequest(query=["ba"], mode="or", k=10,
                                        ts_range=("2024-01-02", "2024-01-03")))
    assert empty.num_hits == 0 and len(empty.hits) == 0
