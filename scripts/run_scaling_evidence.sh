#!/bin/bash
# Generates the 2M-doc input (once) and runs the 4 vs 16 core scaling
# benchmark; writes JSON to /tmp/scaling_evidence.json
set -e
cd "$(dirname "$0")/.."
python - <<'EOF' 2>/dev/null
from bobo_spark.session import get_spark
from bobo_spark.webgen import webpages
spark = get_spark("gen2m", cores=32)
src = "/tmp/bobo_bench_src_2000000.parquet"
try:
    ok = spark.read.parquet(src).count() == 2_000_000
except Exception:
    ok = False
if not ok:
    webpages(spark, 2_000_000, n_partitions=96).write.mode("overwrite").parquet(src)
print("input ready")
spark.stop()
EOF
python scripts/scaling_bench.py 2000000 4 16 2>/dev/null | tee /tmp/scaling_evidence.json
