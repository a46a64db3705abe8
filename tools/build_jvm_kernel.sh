#!/usr/bin/env bash
# Build bensp_suite_spark/jars/bensp-kernels.jar from the Java kernel
# sources, compiling against the installed pyspark's jars. Rerun after any
# edit under bensp_suite_spark/jvm/src/.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
OUT=bensp_suite_spark/jars
CLASSES=$(mktemp -d)
trap 'rm -rf "$CLASSES"' EXIT

javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d "$CLASSES" $(find bensp_suite_spark/jvm/src -name '*.java')
mkdir -p "$OUT"
jar cf "$OUT/bensp-kernels.jar" -C "$CLASSES" .
echo "built $OUT/bensp-kernels.jar"
