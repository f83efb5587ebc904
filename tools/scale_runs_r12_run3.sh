#!/bin/bash
# Round-12 idle re-measure (run3 layer) of the heavy pair-family rows on
# POST-union-find code (005a9a9): the committed chain artifacts
# (scalebench_r12/*_partial.json) ran pre-fix q_semdedup and carried
# catalog self-load on the heaviest rows (sf4 containment 140.7 s vs
# 48.3 s in the idle run2). One Bench invocation per scale dir, subset
# only, idle box, repeat=2 min-of-N — min-merged by tools/scale_curve.py.
set -e
cd /root/repo
SUBSET=q_semdedup,q_dedup_containment,q_ingest_dedup,q_knn_join_ivf,q_dedup_simhash
for sf in sf1 sf1f sf2 sf2f sf4 sf4f; do
  echo "=== $sf ==="
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_ONLY=$SUBSET \
    SPARK_GRAFT_SF_DIR=/root/repo/scaledata/$sf \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '\[bench\]' | tail -10
  mv BENCH_FULL_${sf}_partial.json scalebench_r12/BENCH_FULL_${sf}_partial.run3.json
done
echo "=== RUN3 DONE ==="
