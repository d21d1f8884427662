#!/usr/bin/env bash
# Build dist/kgx.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgx.zip
zip -qr dist/kgx.zip llm_information_extraction_spark \
    -x '*__pycache__*'
echo "dist/kgx.zip:"
unzip -l dist/kgx.zip | tail -3
