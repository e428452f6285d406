"""CLI index builder — the spark-submit entry point.

≙ reference index/MakeBobo.java:45,54-147 (options: source, index,
maxdocs) re-expressed for Spark:

    spark-submit --py-files bobo_spark.zip scripts/build_index.py \
        --input  /path/to/webpages_parquet_or_iceberg \
        --output /path/to/index_dir \
        [--docs-per-segment 1000000] [--block-size 128] [--max-docs N]
        [--resume]

Input table shape (driver input_hint): (url string, warc_ts timestamp,
html binary and/or text string, lang string[, doc_id long]).
Missing text is extracted from html (byte-stable); missing doc_id is
assigned by url-sorted dense rank (deterministic).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Build the bobo_spark inverted index")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--docs-per-segment", type=int, default=1_000_000)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--max-docs", type=int, default=0)
    ap.add_argument("--resume", action="store_true", default=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bobo_spark.build import BuildConfig, build_snapshot
    from bobo_spark.session import get_spark

    spark = get_spark("bobo_build_index")
    docs = spark.read.parquet(args.input)
    if args.max_docs:
        docs = docs.limit(args.max_docs)
    if "doc_id" not in docs.columns:
        from bobo_spark.build import assign_sorted_ids

        ids = assign_sorted_ids(
            docs.select(F.col("url").alias("term")).distinct(), spark
        ).withColumnsRenamed({"term": "url", "term_id": "doc_id"})
        docs = docs.join(ids, "url")
    snap = build_snapshot(
        spark,
        docs,
        args.output,
        BuildConfig(docs_per_segment=args.docs_per_segment, block_size=args.block_size),
        resume=args.resume,
    )
    print(json.dumps({"snapshot_id": snap.snapshot_id, "stats": snap.stats}))
    spark.stop()


if __name__ == "__main__":
    main()
