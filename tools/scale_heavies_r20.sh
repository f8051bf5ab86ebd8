#!/bin/bash
# Round-20 third-decade scaling runs: each (query, scale) in a FRESH JVM
# under local-cluster (2 executors x 16 cores), min-of-2 inside the
# bench main, sequential so runs never co-tenant each other.
# The classpath is deliberately RELATIVE (resolved from /root/repo):
# SparkLaunch.executorClasspath must absolutize it before shipping to
# the executor processes, so these runs double as the regression test
# for that fix.
set -u
cd /root/repo
OUT=target/scalegen/heavies_r20.jsonl
mkdir -p target/scalegen
: > "$OUT"
QUERIES="d_minhash d_semantic s_embed_neardup_scaled t_contamination d_incremental_indexed"
for sf in /root/testdata/sf0.1 target/sf1 target/sf10; do
  for q in $QUERIES; do
    echo "=== $q @ $sf ==="
    SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_QUERIES="$q" \
      SPARK_GRAFT_CPUS=32 SPARK_SCALA_VERSION=2.13 \
      SPARK_GRAFT_MASTER="local-cluster[2,16,8192]" \
      java -Xmx4g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench >target/scalegen/run_out.txt 2>target/scalegen/run_err.txt
    rc=$?
    line=$(grep '"metric"' target/scalegen/run_out.txt || echo 'null')
    echo "{\"sf\":\"$sf\",\"query\":\"$q\",\"rc\":$rc,\"bench\":$line}" >> "$OUT"
    echo "rc=$rc $line"
  done
done
echo DONE
