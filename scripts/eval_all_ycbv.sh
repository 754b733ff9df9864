#!/bin/bash
# Reproduce-paper sweep for YCB-Video (rebuild of the reference
# scripts/eval_all_ycbv.sh): single-view, SLAM, and the ablations
# (no prior, no covariance, GT camera pose). Aggregates the per-method
# summary.txt files into table.txt.
set -e

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
CKPT=${1:-results/latest/model_best}
EXTRA=${@:2}

run() {
    echo "=============================================================="
    echo "RUN: $@"
    python "$REPO_DIR/evaluate.py" --dataset ycbv -c "$CKPT" $@ $EXTRA
}

# single view
run --nviews 1
# full SLAM
run --nviews -1
# ablations
run --nviews -1 --no_prior_det
run --nviews -1 --no_network_cov
run --nviews -1 --gt_cam_pose

# aggregate
OUT_DIR=$(dirname "$CKPT")
TABLE="$OUT_DIR/table.txt"
rm -f "$TABLE"
for summ in "$OUT_DIR"/pkpnet-*ycbv*/summary.txt; do
    echo "==== $summ ====" >> "$TABLE"
    cat "$summ" >> "$TABLE"
    echo "" >> "$TABLE"
done
echo "Wrote $TABLE"
