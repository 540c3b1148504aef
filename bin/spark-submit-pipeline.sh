#!/usr/bin/env bash
# Cluster deployment of the graft KG pipeline (north_rule execution shape).
# Local sandbox has no cluster manager; on a real cluster replace --master.
#
#   bin/spark-submit-pipeline.sh <numPages> <outDir> [master]
#
set -euo pipefail
PAGES="${1:?numPages}"
OUT="${2:?outDir}"
MASTER="${3:-local[32]}"
sbt -batch package
JAR=$(ls target/scala-2.13/harrietspark_2.13-*.jar | grep -v tests | head -1)
exec spark-submit \
  --master "$MASTER" \
  --class graft.PipelineMain \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --conf spark.sql.shuffle.partitions=200 \
  "$JAR" "$PAGES" "$OUT"
