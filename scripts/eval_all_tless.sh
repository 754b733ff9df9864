#!/bin/bash
# Reproduce-paper sweep for T-LESS (rebuild of the reference
# scripts/eval_all_tless.sh): single-view + SLAM + ablations, VSD scoring.
set -e

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
CKPT=${1:-results/latest/model_best}
EXTRA=${@:2}

run() {
    echo "=============================================================="
    echo "RUN: $@"
    python "$REPO_DIR/evaluate.py" --dataset tless -c "$CKPT" $@ $EXTRA
}

run --nviews 1
run --nviews -1
run --nviews -1 --no_prior_det
run --nviews -1 --no_network_cov

OUT_DIR=$(dirname "$CKPT")
TABLE="$OUT_DIR/table_tless.txt"
rm -f "$TABLE"
for summ in "$OUT_DIR"/pkpnet-*tless*/summary.txt "$OUT_DIR"/pkpnet-*tless*/vsd_summary.txt; do
    [ -f "$summ" ] || continue
    echo "==== $summ ====" >> "$TABLE"
    cat "$summ" >> "$TABLE"
    echo "" >> "$TABLE"
done
echo "Wrote $TABLE"
