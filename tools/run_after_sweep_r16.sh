#!/usr/bin/env bash
# r16 post-sweep measurement ladder (run ONLY on a quiet box, after the
# sf100 sweep exits — see memory: concurrent runs contaminate steadies).
# Usage: tools/run_after_sweep_r16.sh {bench01|refork|funnel}
set -euo pipefail
cd /root/repo
case "${1:?bench01|refork|funnel}" in
  bench01)
    # verdict task 2: median-of-3 contract bracket at current HEAD
    for i in 1 2 3; do
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=24g \
        tools/run.sh graft.Bench > /tmp/bench_sf01_r16_run$i.json.raw 2>/tmp/bench_sf01_r16_run$i.err
      grep '"metric":"total"' /tmp/bench_sf01_r16_run$i.json.raw | head -1 \
        > /tmp/bench_sf01_r16_run$i.json
      python3 -c "import json;d=json.load(open('/tmp/bench_sf01_r16_run$i.json'));print('run $i total', d['value'], 'failed', d['failed'])"
    done
    ;;
  refork)
    # re-measure the forked steadies whose sweep window overlapped the
    # r16 gate runs (tfidf, text_chunk; others read in-class)
    for q in q_text_tfidf q_text_chunk; do
      SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g SPARK_GRAFT_RUNS=3 \
        tools/run.sh graft.BenchOne "$q" 2>&1 | grep -E "benchone|run"
    done
    ;;
  funnel)
    # verdict task 6: cold design-regime, >=5 alternating runs,
    # diskstats-based byte measurement
    SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g \
    SPARK_GRAFT_COLD=1 SPARK_GRAFT_NLISTS=8 SPARK_GRAFT_NPROBE=4 \
    SPARK_GRAFT_REPLICATE=10 SPARK_GRAFT_RUNS=5 \
      tools/run.sh graft.tools.ProbeFunnel 2>&1 | grep -E "probefunnel"
    ;;
esac
