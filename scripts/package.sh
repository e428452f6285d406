#!/bin/bash
# Package the engine for spark-submit --py-files
set -e
cd "$(dirname "$0")/.."
rm -f bobo_spark.zip
zip -qr bobo_spark.zip bobo_spark -x '*__pycache__*'
echo "built bobo_spark.zip"
