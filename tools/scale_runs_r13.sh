#!/bin/bash
# Round-13 scale-curve measurement chain: the 25-query pair-family subset
# at sf1/sf2/sf4 (replica + fresh) on r13 code, artifacts in
# scalebench_r13/ so tools/scale_curve.py fits the r13 curve from
# r13-code runs ONLY. Protocol identical to r12: CPUS=32, 48 g driver,
# repeat=2 min-of-N.
#
# SPILL HYGIENE (the r12 run7 / r13 probe lesson): a crashed or killed
# bench JVM leaks its blockmgr-* spill dir in /tmp — a 25 GB leak from
# the morning run sat on this box all day and a later heavy query died
# with SPILL_OUT_OF_MEMORY("No space left on device"). Every run here
# gets a dedicated SPARK_LOCAL_DIRS that is force-cleaned after it, and
# the chain refuses to start a run with < 40 GB free.
set -e
cd /root/repo
mkdir -p scalebench_r13
SUBSET=q_chunk_containment,q_dedup_cluster_sizes,q_dedup_containment,q_dedup_corpus,q_dedup_embedding,q_dedup_embedding_exact,q_dedup_embedding_lsh,q_dedup_embedding_lsh_pinned,q_dedup_keep_best,q_dedup_minhash,q_dedup_ngram_jaccard,q_dedup_simhash,q_edit_join,q_ingest_dedup,q_knn_join_ivf,q_lsh_sweep_sampled,q_minhash_eval_sampled,q_paragraph_dedup,q_semdedup,q_simhash_eval_sampled,q_split_leakage_safe,q_substring_dedup,q_winnow_pairs,q_ann_ivf,q_kmeans_train
SPILL=/tmp/graft_spill_r13
for sf in "$@"; do
  free_gb=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt 40 ]; then
    echo "ABORT before $sf: only ${free_gb}G free (< 40G)" >&2; exit 1
  fi
  echo "=== $sf (${free_gb}G free) ==="
  rm -rf "$SPILL"; mkdir -p "$SPILL"
  SPARK_LOCAL_DIRS=$SPILL SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_ONLY=$SUBSET \
    SPARK_GRAFT_SF_DIR=/root/repo/scaledata/$sf \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '\[bench\]|\[graft\]|"metric"' | tail -32
  rm -rf "$SPILL"
  mv BENCH_FULL_${sf}_partial.json scalebench_r13/
done
echo "=== CHAIN DONE ==="
