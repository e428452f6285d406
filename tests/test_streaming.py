"""Streaming ingest: micro-batches become snapshots; queries over the
merged snapshots equal the batch-built oracle (≙ the reference's
BasicIndexingTest interleaved commit/reopen cycle)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from bobo_spark.build import BuildConfig
from bobo_spark.catalog import IndexCatalog
from bobo_spark.oracle import OracleIndex
from bobo_spark.query import IndexReader, SearchRequest
from bobo_spark.streaming import ingest_stream
from bobo_spark.webgen import webpages

CFG = BuildConfig(docs_per_segment=200, block_size=64)


def test_stream_ingest_snapshots(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_stream"))
    src = str(tmp_path_factory.mktemp("stream_src"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    full = webpages(spark, 900, 4)
    schema = full.schema
    # three "arriving" files = three micro-batches (at most; Spark may
    # coalesce them — the ledger only needs monotone doc_ids)
    for i, (lo, hi) in enumerate([(0, 300), (300, 600), (600, 900)]):
        full.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = ingest_stream(stream, d, CFG, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cat = IndexCatalog(d)
    published = [s for s in cat.snapshots() if "published" in s.stages]
    assert len(published) >= 1
    reader = IndexReader(spark, d)
    assert reader.n_docs == 900

    # query over merged snapshots == oracle over the full corpus
    pdf = (
        full.select("doc_id", "text", "lang",
                    F.date_format(F.date_trunc("day", "warc_ts"), "yyyy-MM-dd")
                    .alias("ts_bucket"))
        .toPandas()
    )
    oracle = OracleIndex(pdf.to_dict("records"))
    got = reader.search(SearchRequest(query=["ba", "keri"], mode="or", k=10))
    exp = oracle.search(["ba", "keri"], mode="or", k=10)
    assert got.hits["doc_id"].tolist() == [x for x, _ in exp["hits"]]
    assert got.hits["score"].tolist() == [s for _, s in exp["hits"]]
    assert got.num_hits == exp["num_hits"]
