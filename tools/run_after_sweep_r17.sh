#!/usr/bin/env bash
# r17 quiet-box measurement ladder (r16 verdict tasks 1 + 4). Every
# mode passes the quiet guard first — nothing here may run beside the
# sweep, sbt, or each other.
# Usage: tools/run_after_sweep_r17.sh {rebracket|joinrange|compact|bench01}
set -euo pipefail
cd /root/repo
source tools/quiet_guard.sh
quiet_guard
case "${1:?rebracket|joinrange|compact|bench01}" in
  rebracket)
    # verdict task 1: standalone fresh-JVM x3 for the four >2x sf100
    # in-sweep readings (vs r14: u3 26.8, w5 29.7, a2 76.9, zorder 110.3)
    for q in q_u3_keyed_dedup_first q_w5_moving_avg q_a2_two_level_max \
             q_layout_zorder; do
      SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g SPARK_GRAFT_RUNS=3 \
        tools/run.sh graft.BenchOne "$q" 2>&1 | grep -E "benchone"
    done
    ;;
  joinrange)
    # verdict task 1 tail: median-of-5 for q_join_range (r14: 37.4;
    # r16 standalone x3 spanned 49.8-215.1 on identical code)
    SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g SPARK_GRAFT_RUNS=5 \
      tools/run.sh graft.BenchOne q_join_range 2>&1 | grep -E "benchone"
    ;;
  compact)
    # verdict task 4: compaction in anger at sf10 (~48 appends)
    SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=24g \
      tools/run.sh graft.tools.ProbeCompact 2>&1 | grep -E "probecompact"
    ;;
  bench01)
    # contract-scale sanity bracket at HEAD (median-of-3)
    for i in 1 2 3; do
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=24g \
        tools/run.sh graft.Bench > /tmp/bench_sf01_r17_run$i.json.raw \
        2>/tmp/bench_sf01_r17_run$i.err
      grep '"metric":"total"' /tmp/bench_sf01_r17_run$i.json.raw | head -1 \
        > /tmp/bench_sf01_r17_run$i.json
      python3 -c "import json;d=json.load(open('/tmp/bench_sf01_r17_run$i.json'));print('run $i total', d['value'], 'failed', d['failed'])"
    done
    ;;
esac
