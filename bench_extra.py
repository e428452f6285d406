"""Extra benchmarks (guide §1.4): noop-sink isolation of the heavy
sf-dir operators, phase by phase, so optimization targets the real
cost.  NOT part of the driver contract — bench.py stays frozen.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [op ...]
Ops: neardup_lsh minhash simhash tokencounts sessionize dedup_exact all
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:55s} {dt:8.3f} s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    ops = set(sys.argv[1:]) or {"all"}
    from bobo_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("bobo_bench_extra")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    print(f"sf_dir={SF_DIR} docs={docs.count()} emb={emb.count()}")

    from bobo_spark import simsearch, textops

    if ops & {"all", "neardup_lsh"}:
        print("== simsearch_neardup_lsh (dim=64, n_planes=6, cap=None, thr=0.2)")
        planes = simsearch.hyperplanes(64, 6, 7)
        banded = emb.select(
            F.col("vec_id").alias("id"),
            simsearch._dvec(F.col("embedding")).alias("sig"),
            F.lit(0).alias("band"),
            simsearch.lsh_bucket_col("embedding", planes).alias("bucket"),
        )
        timed(spark, "phase: banded (bucket col) noop", lambda: noop(banded))
        pairs = textops._bucket_pairs(banded, None)
        n = timed(spark, "phase: bucket_pairs count", lambda: pairs.count())
        print(f"    candidate pairs: {n}")
        full = simsearch.cosine_neardup_pairs_lsh(
            emb, dim=64, threshold=0.2, n_planes=6, max_bucket_size=None)
        timed(spark, "full op noop", lambda: noop(full))
        n = timed(spark, "full op count", lambda: full.count())
        print(f"    surviving pairs: {n}")

    if ops & {"all", "minhash"}:
        print("== dedup_minhash_lsh (n=3, k=16, bands=4, thr=0.2, cap=None)")
        sigs = textops.minhash_signatures(docs, n=3, k=16)
        timed(spark, "phase: minhash_signatures noop", lambda: noop(sigs))
        # reference measurement of the PRE-r6 formulation (interpreted
        # shingle HOF + explode) — kept so the before/after is
        # reproducible; the engine no longer executes this shape
        sh = docs.select(
            F.col("doc_id"),
            F.explode(textops.shingles("text", 3)).alias("_s"))
        timed(spark, "phase: OLD explode-shingles formulation noop", lambda: noop(sh))
        hh = sh.select("doc_id",
                       (textops._shingle_hash(F.col("_s")) % textops.MERSENNE31)
                       .alias("_h"))
        timed(spark, "phase: OLD + md5/conv hash noop", lambda: noop(hh))
        r = 4
        bandedm = sigs.select(
            F.col("doc_id").alias("id"), F.col("minhash").alias("sig"),
            F.explode(F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.md5(F.concat_ws(",", F.transform(
                        F.slice(F.col("minhash"), bi * r + 1, r),
                        lambda x: x.cast("string")))).alias("bucket"),
                ))).alias("bb"),
        ).select("id", "sig", "bb.band", "bb.bucket")
        pm = textops._bucket_pairs(bandedm, None)
        n = timed(spark, "phase: bucket_pairs count", lambda: pm.count())
        print(f"    candidate pairs: {n}")
        full = textops.minhash_lsh_pairs(docs, n=3, k=16, bands=4, threshold=0.2,
                                         max_bucket_size=None)
        timed(spark, "full op noop", lambda: noop(full))
        n = timed(spark, "full op count", lambda: full.count())
        print(f"    surviving pairs: {n}")

    if ops & {"all", "simhash"}:
        print("== simhash64")
        sim = textops.simhash64(docs)
        timed(spark, "full op noop", lambda: noop(sim))
        pairs = textops.simhash_neardup_pairs(docs, max_hamming=3,
                                              max_bucket_size=None)
        timed(spark, "simhash_neardup_pairs noop", lambda: noop(pairs))

    if ops & {"all", "tokencounts"}:
        print("== token_counts / quality / langid")
        timed(spark, "token_counts noop", lambda: noop(textops.token_counts(docs)))
        timed(spark, "quality_scores noop", lambda: noop(textops.quality_scores(docs)))
        timed(spark, "langid noop", lambda: noop(textops.langid(docs)))

    if ops & {"all", "dedup_exact"}:
        print("== dedup_exact")
        timed(spark, "exact noop", lambda: noop(
            docs.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_dups"))))

    if ops & {"all", "sessionize"}:
        print("== sessionize_events")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        from pyspark.sql.window import Window
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        marked = ev.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        sess = marked.withColumn(
            "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        out = sess.groupBy("user_id").agg(
            F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
        timed(spark, "sessionize noop", lambda: noop(out))

    if ops & {"all", "cosine"}:
        print("== simsearch_topk_cosine")
        qv = [float(x) for x in
              emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
        timed(spark, "cosine_topk collect", lambda: simsearch.cosine_topk(
            emb, qv, k=10).collect())

    spark.stop()


if __name__ == "__main__":
    main()
