#!/bin/bash
# Round-12 scale-curve measurement chain: the 23-query pair-family
# subset at sf1/sf2/sf4 (replica + fresh) on r12 code, artifacts moved
# into scalebench_r12/ so tools/scale_curve.py fits the r12 curve from
# r12-code runs ONLY (min-merging against r11-code artifacts would mix
# engines). Protocol identical to r11: CPUS=32, 48 g driver, repeat=2
# min-of-N.
set -e
cd /root/repo
mkdir -p scalebench_r12
# r11's 23-query pair-family subset + the two newly adaptive-K rows
# (q_ann_ivf, q_kmeans_train)
SUBSET=q_chunk_containment,q_dedup_cluster_sizes,q_dedup_containment,q_dedup_corpus,q_dedup_embedding,q_dedup_embedding_exact,q_dedup_embedding_lsh,q_dedup_embedding_lsh_pinned,q_dedup_keep_best,q_dedup_minhash,q_dedup_ngram_jaccard,q_dedup_simhash,q_edit_join,q_ingest_dedup,q_knn_join_ivf,q_lsh_sweep_sampled,q_minhash_eval_sampled,q_paragraph_dedup,q_semdedup,q_simhash_eval_sampled,q_split_leakage_safe,q_substring_dedup,q_winnow_pairs,q_ann_ivf,q_kmeans_train
for sf in sf1 sf2 sf4 sf1f sf2f sf4f; do
  echo "=== $sf ==="
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_ONLY=$SUBSET \
    SPARK_GRAFT_SF_DIR=/root/repo/scaledata/$sf \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '\[bench\]|"metric"' | tail -30
  mv BENCH_FULL_${sf}_partial.json scalebench_r12/
done
echo "=== CHAIN DONE ==="
