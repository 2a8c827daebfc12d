#!/bin/bash
# tools/submit.sh — package the thin jar and run graft.tools.SubmitSmoke
# through spark-submit, the way a real deploy launches the engine.
#
#   tools/submit.sh [sfDir]
#
# Default master is local-cluster[2,4,2048]: two SEPARATE executor JVMs
# (4 cores / 2 GB each) that receive the jar over the wire — the
# closest a single machine gets to a real cluster (serialization, jar
# shipping, executor-side codegen all real). Override with
# SPARK_GRAFT_SUBMIT_MASTER (e.g. yarn, k8s://..., spark://...).
#
# The jar is THIN on purpose: every dependency is Spark itself, which
# the cluster provides — the same `unmanagedBase = /opt/spark/jars`
# posture as the build, so there is nothing to shade or assemble.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.001}"
MASTER="${SPARK_GRAFT_SUBMIT_MASTER:-local-cluster[2,4,2048]}"

sbt -batch package
JAR="$(ls target/scala-*/hadoophistogramanalyzespark*.jar | head -1)"
echo "jar: $JAR"

export SPARK_HOME=/opt/spark
# spark.sql.extensions is the conf-string registration a cluster user
# writes (GraftSession.configure also injects programmatically — the
# registry replaces duplicates, so both paths together are safe); the
# smoke's q61/q64 then resolve the sketch SQL functions through it.
"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --class graft.tools.SubmitSmoke \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.core.GraftExtensions \
  --conf spark.executor.memory=1536m \
  "$JAR" "$SF"
