"""Scale hardening of the LSH paths: capped band buckets (giant
dup-cluster stress) and the materialized bucket-partitioned ANN index
(partition pruning + multiprobe)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bobo_spark import simsearch, textops


def test_capped_buckets_dup_cluster(spark):
    """A 120-doc exact-dup cluster must cost O(c) pairs with a cap,
    not C(120,2), while keeping every member connected to the
    representative."""
    rows = [(i, "the same exact duplicated text payload number one") for i in range(120)]
    rows += [(1000 + i, f"unique text number {i} with filler tokens alpha beta gamma")
             for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = textops.minhash_lsh_pairs(docs, threshold=0.9, max_bucket_size=10).toPandas()
    cluster = capped[(capped["id_a"] < 1000) & (capped["id_b"] < 1000)]
    # representative pairing: exactly (c-1) pairs, all anchored at min id 0
    assert len(cluster) == 119
    assert set(cluster["id_a"]) == {0}
    assert set(cluster["id_b"]) == set(range(1, 120))
    # uncapped would explode quadratically on the same input
    full = textops.minhash_lsh_pairs(docs, threshold=0.9).toPandas()
    assert len(full[(full["id_a"] < 1000) & (full["id_b"] < 1000)]) == 120 * 119 // 2


def test_capped_simhash_pairs(spark):
    rows = [(i, "another big family of identical web pages crawled twice")
            for i in range(60)]
    rows += [(500 + i, f"distinct page {i} about nothing in particular") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = textops.simhash_neardup_pairs(docs, max_hamming=0,
                                           max_bucket_size=8).toPandas()
    cluster = capped[(capped["id_a"] < 500) & (capped["id_b"] < 500)]
    assert len(cluster) == 59 and set(cluster["id_a"]) == {0}


@pytest.fixture(scope="module")
def lsh_index(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lsh_idx"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    simsearch.build_lsh_index(emb, d, dim=64, n_planes=6)
    return d, emb


def test_lsh_index_partition_pruning(spark, lsh_index):
    d, emb = lsh_index
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    df = simsearch.lsh_topk_indexed(spark, d, qv, k=10)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "_bucket" in plan and "PartitionFilters" in plan, plan[:800]
    # identical results to the on-the-fly bucket scan
    flat = simsearch.lsh_topk(emb, qv, k=10, n_planes=6).toPandas()
    idx = df.toPandas()
    assert idx.values.tolist() == flat.values.tolist()


def test_lsh_index_multiprobe(spark, lsh_index):
    d, emb = lsh_index
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    planes = simsearch.hyperplanes(64, 6)
    buckets = simsearch.probe_buckets(qv, planes, probes=3)
    assert len(set(buckets)) == 3
    got = simsearch.lsh_topk_indexed(spark, d, qv, k=10, probes=3).toPandas()
    # brute-force reference: exact cosine top-k restricted to the union
    want = simsearch.cosine_topk(
        emb.withColumn("_b", simsearch.lsh_bucket_col("embedding", planes))
        .where(F.col("_b").isin(buckets)), qv, k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # more probes -> candidate set grows monotonically
    one = simsearch.lsh_topk_indexed(spark, d, qv, k=10**6, probes=1).count()
    three = simsearch.lsh_topk_indexed(spark, d, qv, k=10**6, probes=3).count()
    assert three >= one


def test_cap_is_the_default(spark):
    """The scale-safe cap must be ON by default: a giant dup cluster
    expands O(c) representative pairs unless the caller explicitly
    opts out with max_bucket_size=None (the oracle-equality variant)."""
    import inspect

    for fn in (textops.minhash_lsh_pairs, textops.simhash_neardup_pairs,
               simsearch.cosine_neardup_pairs_lsh):
        default = inspect.signature(fn).parameters["max_bucket_size"].default
        assert isinstance(default, int) and default > 0, fn.__name__
    rows = [(i, "one enormous duplicated cluster of pages") for i in range(1500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = textops.minhash_lsh_pairs(docs, threshold=0.9).toPandas()
    assert len(pairs) == 1499 and set(pairs["id_a"]) == {0}


@pytest.fixture(scope="module")
def ivf_index(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf_idx"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    simsearch.build_ivf_index(emb, d, dim=64, n_centroids=8, sample=200)
    return d, emb


def test_ivf_partition_pruning_and_equivalence(spark, ivf_index):
    d, emb = ivf_index
    import json
    meta = json.load(open(f"{d}/meta.json"))
    cent = np.array(meta["centroids"])
    qv = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    df = simsearch.ivf_topk(spark, d, qv, k=10, nprobe=2)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "_cell" in plan and "PartitionFilters" in plan, plan[:800]
    # equals exact cosine restricted to the probed cells (flat scan)
    cells = simsearch.ivf_probe_cells(qv, cent, nprobe=2)
    want = simsearch.cosine_topk(
        emb.withColumn("_c", simsearch.ivf_cell_col("embedding", cent))
        .where(F.col("_c").isin(cells)), qv, k=10).toPandas()
    assert df.toPandas().values.tolist() == want.values.tolist()


def test_ivf_centroids_deterministic(spark, ivf_index):
    d, emb = ivf_index
    samp = (emb.orderBy("vec_id").limit(200)
            .select("embedding").toPandas()["embedding"])
    vs = np.array([np.asarray(x, dtype=np.float64) for x in samp])
    c1 = simsearch.kmeans_centroids(vs, 8)
    c2 = simsearch.kmeans_centroids(vs, 8)
    assert (c1 == c2).all()
    # every cell id in the written index is a valid centroid index and
    # more probes can only widen the candidate set
    one = simsearch.ivf_topk(spark, d, [1.0] * 64, k=10**6, nprobe=1).count()
    allp = simsearch.ivf_topk(spark, d, [1.0] * 64, k=10**6, nprobe=8).count()
    assert allp == emb.count() and one <= allp


def test_uncapped_big_bucket_anchor_path(spark):
    """Uncapped buckets past the triu-block size limit (512 for
    minhash, 1024 for simhash) take the per-anchor chunked path —
    it must produce the exact full O(c^2) expansion."""
    c = 600
    rows = [(i, "same duplicated payload for the anchor path test") for i in range(c)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = textops.minhash_lsh_pairs(docs, threshold=0.9,
                                      max_bucket_size=None).toPandas()
    assert len(pairs) == c * (c - 1) // 2
    assert (pairs["est_jaccard"] == 1.0).all()
    # every doc participates, smallest anchor covers c-1 pairs
    assert (pairs["id_a"] == 0).sum() == c - 1

    c2 = 1100
    rows2 = [(i, "identical simhash family page") for i in range(c2)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    sp = textops.simhash_neardup_pairs(docs2, max_hamming=0,
                                       max_bucket_size=None).toPandas()
    assert len(sp) == c2 * (c2 - 1) // 2
    assert (sp["hamming"] == 0).all()
