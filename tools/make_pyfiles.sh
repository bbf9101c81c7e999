#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule deployment).
#
#   ./tools/make_pyfiles.sh            -> dist/ccc_spark.zip
#   spark-submit --py-files dist/ccc_spark.zip your_job.py
#
# The zip contains only the library package (no tests/bench); job scripts
# import companycatalogcrawlerparser_spark.* exactly as in local runs.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ccc_spark.zip
zip -qr dist/ccc_spark.zip companycatalogcrawlerparser_spark \
    -x '*__pycache__*'
echo "wrote dist/ccc_spark.zip ($(du -h dist/ccc_spark.zip | cut -f1))"
