#!/usr/bin/env bash
# Package the engine for cluster deployment (north_rule: "run via
# spark-submit --py-files on a multi-executor cluster").
#
#   tools/build_pyfiles.sh            → dist/great_expectations_spark.zip
#
# Submit example (any cluster manager):
#
#   spark-submit \
#     --master yarn --deploy-mode cluster \
#     --py-files dist/great_expectations_spark.zip \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.adaptive.skewJoin.enabled=true \
#     --conf spark.sql.execution.arrow.pyspark.enabled=true \
#     tools/run_suite.py \
#       --table  s3://…/transcripts/          \
#       --suite  suites/north_star.json       \
#       --manifest s3://…/gx_manifest/        \
#       --evr      s3://…/gx_evr/             \
#       --violations s3://…/gx_violations/    \
#       --derive '__text_len=length(text)'    \
#       --dim tools=s3://…/tools_dim/         \
#       --partition-col conv_bucket
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/great_expectations_spark.zip
zip -qr dist/great_expectations_spark.zip great_expectations_spark \
    -x '*/__pycache__/*'
python - <<'EOF'
import zipfile
names = zipfile.ZipFile("dist/great_expectations_spark.zip").namelist()
assert "great_expectations_spark/__init__.py" in names, names[:5]
print(f"dist/great_expectations_spark.zip: {len(names)} files")
EOF
