#!/usr/bin/env bash
# sf100 hybrid-fork sweep launcher (r17). Same shape as r16 (classpath
# pinned to a pre-round snapshot so mid-round recompiles can't change
# the code under measurement) plus the two r16-verdict #5 fixes:
#  - quiet-box guard: refuses to start while any other JVM is running
#    (the r16 sweep self-contaminated against the round's own tests);
#  - per-query completion stamps now ride Bench's stderr progress
#    lines, so a contended window is datable post-hoc.
set -uo pipefail
source "$(dirname "$0")/quiet_guard.sh"
quiet_guard
CLASSES=${SWEEP_CLASSES:-/root/repo/target/classes-sweep-r17}
if [[ ! -d "$CLASSES" ]]; then
  echo "ERROR: $CLASSES missing — snapshot it first:" >&2
  echo "  cp -a /root/repo/target/scala-2.13/classes $CLASSES" >&2
  exit 1
fi
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
OPENS=(java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
export SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_SHUFFLE=256
export SPARK_GRAFT_SINGLE=1
export SPARK_GRAFT_FORCE=noop
export SPARK_GRAFT_SKIP=q_embed_neardup_cosine,q_x2_fuzzy_scoped
export SPARK_GRAFT_FORK=q_a1_groupby_leaderboard,q_bloom_decontaminate,q_dedup_clusters,q_dedup_minhash_lsh,q_dedup_ngram_jaccard,q_dedup_simhash_pairs,q_embed_ann_ivf,q_embed_ann_lsh,q_embed_semdedup,q_layout_zorder,q_neardup_prune,q_span_dedup,q_text_chunk,q_text_lm_score,q_text_pii_redact,q_text_tfidf,q_x3_fuzzy_prefix_join
cd /root/repo
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx80g \
  -cp "$CLASSES:$JARS" graft.Bench
