"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and LSH-bucketed approximate variant (the scale path).

The dot product / norms are pure Spark SQL expressions
(``zip_with`` + ``aggregate``) — JVM-side, codegen'd, no UDF.
Embeddings are cast to double before any arithmetic so Spark and the
DuckDB oracle round identically.

Scale notes: brute-force is one scan + TakeOrderedAndProject (no
shuffle beyond the final top-k merge) — correct but O(N) per query;
the LSH variant buckets vectors by deterministic hyperplane sign bits
so a query probes only its bucket (+ optional 1-bit neighbors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .webgen import _splitmix64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k against one query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _dvec(F.col(vec_col))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        df.select(F.col(id_col), F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-duplicate pairs (cosine >= threshold).

    O(N^2) oracle variant — use lsh_buckets + within-bucket pairs at
    corpus scale."""
    a = df.select(F.col(id_col).alias("id_a"), _dvec(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), _dvec(F.col(vec_col)).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random unit hyperplanes (counter-hashed)."""
    ctr = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u = (_splitmix64(ctr) >> np.uint64(11)).astype(np.float64) / (1 << 53)
    planes = (u * 2 - 1).reshape(n_planes, dim)
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def lsh_bucket_col(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from hyperplane projections (pure expression)."""
    v = _dvec(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        q = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(v, q) > 0,
                                 F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: probe only the query's LSH bucket.

    Recall/probe tradeoff via n_planes; partition-prunable when the
    table is written partitioned by bucket."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qb = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0))
    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    cand = bucketed.where(F.col("_bucket") == qb)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
