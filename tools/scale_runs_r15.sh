#!/bin/bash
# Round-15 scale-curve measurement chain. Protocol identical to r14
# (CPUS=32, 48 g driver, repeat=2 min-of-N, dedicated spill dir per run,
# pipefail + artifact-freshness + spill-fs space checks) plus the
# r14-ADVICE fix: the grep stage of the bench pipe exits 1 when a run's
# stdout has no matching lines, and under `set -o pipefail` that aborted
# the chain with a failure attributed to the pipe instead of the JVM —
# only the sbt exit status should fail the chain (the artifact freshness
# check catches a genuinely dead run), so the filter stage is `|| true`d.
# Each run's stderr goes to scalebench_r15/<sf><tag>.log so gate decisions
# ([graft] ... arm gate / dup-rate gate / auto-banding) and canary lines
# are part of the artifact.
#
# Usage: tools/scale_runs_r15.sh sf1f sf2f sf4f sf8f ...
#   SPARK_GRAFT_SUBSET overrides the query subset;
#   SPARK_GRAFT_CONTAINMENT_ARM / SPARK_GRAFT_COLLAPSE are forwarded (A/B
#   runs) and land in the artifact's graft_env; TAG=exactab names the
#   log/artifact suffix.
set -eo pipefail
cd /root/repo
mkdir -p scalebench_r15
SUBSET=${SPARK_GRAFT_SUBSET:-q_chunk_containment,q_dedup_cluster_sizes,q_dedup_containment,q_dedup_containment_lsh,q_dedup_corpus,q_dedup_embedding,q_dedup_embedding_lsh,q_dedup_keep_best,q_dedup_minhash,q_dedup_ngram_jaccard,q_dedup_simhash,q_edit_join,q_ingest_dedup,q_knn_join_ivf,q_lsh_sweep_sampled,q_minhash_eval_sampled,q_paragraph_dedup,q_semdedup,q_simhash_eval_sampled,q_split_leakage_safe,q_substring_dedup,q_winnow_pairs,q_ann_ivf,q_kmeans_train,q_containment_lsh_eval_sampled}
SPILL=/tmp/graft_spill_r15
TAG=${TAG:-}
for sf in "$@"; do
  free_gb=$(df --output=avail -BG "$(dirname "$SPILL")" | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt 40 ]; then
    echo "ABORT before $sf: only ${free_gb}G free on spill fs (< 40G)" >&2
    exit 1
  fi
  echo "=== $sf$TAG (${free_gb}G free) ==="
  rm -rf "$SPILL"; mkdir -p "$SPILL"
  marker=$(mktemp /tmp/graft_r15_start.XXXXXX)
  SPARK_LOCAL_DIRS=$SPILL SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$SUBSET \
    SPARK_GRAFT_SF_DIR=/root/repo/scaledata/$sf \
    sbt -batch "runMain graft.Bench" \
    2> >(tee "scalebench_r15/${sf}${TAG}.log" >&2) \
    | { grep -E '\[bench\]|\[graft\]|"metric"' || true; } | tail -40
  rm -rf "$SPILL"
  partial=BENCH_FULL_${sf}_partial.json
  if [ ! "$partial" -nt "$marker" ]; then
    echo "ABORT after $sf: $partial is stale (older than run start)" >&2
    rm -f "$marker"; exit 1
  fi
  rm -f "$marker"
  mv "$partial" "scalebench_r15/BENCH_FULL_${sf}${TAG}_partial.json"
done
echo "=== CHAIN DONE ==="
