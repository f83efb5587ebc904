#!/bin/bash
# Round-14 scale-curve measurement chain. Protocol identical to r13
# (CPUS=32, 48 g driver, repeat=2 min-of-N, dedicated spill dir per run)
# plus the r13-ADVICE hardening:
#   - `set -o pipefail`: the bench run is piped through grep/tail, so a
#     crashed JVM must fail the chain instead of shipping a stale partial
#     (the r12 run7 artifact-integrity failure mode).
#   - artifact freshness check: the partial must be newer than the run's
#     start marker before it is moved into scalebench_r14/.
#   - free-space check on the filesystem that actually holds $SPILL, not /.
# Each run's stderr goes to scalebench_r14/<sf><tag>.log so gate decisions
# ([graft] ... dup-rate gate) and canary lines are part of the artifact.
#
# Usage: tools/scale_runs_r14.sh sf1 sf1f sf2 sf2f sf4 sf4f sf2d sf4d
#   SPARK_GRAFT_SUBSET overrides the query subset;
#   SPARK_GRAFT_COLLAPSE=off is forwarded (A/B runs) and lands in the
#   artifact's graft_env; TAG=offab names the log/artifact suffix.
set -eo pipefail
cd /root/repo
mkdir -p scalebench_r14
SUBSET=${SPARK_GRAFT_SUBSET:-q_chunk_containment,q_dedup_cluster_sizes,q_dedup_containment,q_dedup_containment_banded,q_dedup_containment_lsh,q_dedup_corpus,q_dedup_embedding,q_dedup_embedding_exact,q_dedup_embedding_lsh,q_dedup_embedding_lsh_pinned,q_dedup_keep_best,q_dedup_minhash,q_dedup_ngram_jaccard,q_dedup_simhash,q_edit_join,q_ingest_dedup,q_knn_join_ivf,q_lsh_sweep_sampled,q_minhash_eval_sampled,q_paragraph_dedup,q_semdedup,q_simhash_eval_sampled,q_split_leakage_safe,q_substring_dedup,q_winnow_pairs,q_ann_ivf,q_kmeans_train}
SPILL=/tmp/graft_spill_r14
TAG=${TAG:-}
for sf in "$@"; do
  free_gb=$(df --output=avail -BG "$(dirname "$SPILL")" | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt 40 ]; then
    echo "ABORT before $sf: only ${free_gb}G free on spill fs (< 40G)" >&2
    exit 1
  fi
  echo "=== $sf$TAG (${free_gb}G free) ==="
  rm -rf "$SPILL"; mkdir -p "$SPILL"
  marker=$(mktemp /tmp/graft_r14_start.XXXXXX)
  SPARK_LOCAL_DIRS=$SPILL SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$SUBSET \
    SPARK_GRAFT_SF_DIR=/root/repo/scaledata/$sf \
    sbt -batch "runMain graft.Bench" \
    2> >(tee "scalebench_r14/${sf}${TAG}.log" >&2) \
    | grep -E '\[bench\]|\[graft\]|"metric"' | tail -32
  rm -rf "$SPILL"
  partial=BENCH_FULL_${sf}_partial.json
  if [ ! "$partial" -nt "$marker" ]; then
    echo "ABORT after $sf: $partial is stale (older than run start)" >&2
    rm -f "$marker"; exit 1
  fi
  rm -f "$marker"
  mv "$partial" "scalebench_r14/BENCH_FULL_${sf}${TAG}_partial.json"
done
echo "=== CHAIN DONE ==="
