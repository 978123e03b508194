#!/bin/bash
# Round-11 third-decade widen runner: one Bench invocation per batch.
#   usage: tools/run_widen.sh <sfdir> <tag> <batch-name> [shuffle-partitions]
# Batch lists live in /tmp/widen_batches.json (wA_tpch wB_rel wC_text wD_embmm).
set -e
SFDIR=$1; TAG=$2; BATCH=$3; PARTS=${4:-128}
QL=$(python3 -c "import json; print(','.join(json.load(open('/tmp/widen_batches.json'))['$BATCH']))")
echo "batch $BATCH: $QL"
SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$PARTS SPARK_GRAFT_IO_CODEC=zstd \
  SPARK_DRIVER_MEM=80g \
  SPARK_GRAFT_BENCH_ONLY=$QL \
  SPARK_GRAFT_BENCH_OUT=tools/bench_r11_${BATCH}_${TAG}.json \
  sbt -batch 'runMain graft.Bench'
