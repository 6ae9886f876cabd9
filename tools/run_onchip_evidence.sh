#!/bin/bash
# Sequential on-chip evidence chain (r4, VERDICT items 1/3/6).
#
# Run ALONE on the TPU host: no concurrent pytest/bench load (the dispatch
# loop is host-CPU sensitive) and no parallel heavy compiles (the remote
# compile helper is a single queue; abandoned jobs wedge it — CLAUDE.md).
#
# Artifacts produced (commit all of them):
#   GOLDENS_TPU.json   -- auditable on-chip goldens run (incl. wide p=5/7/9)
#   BENCH_SWEEP.json   -- the full sweep every documented number must trace to
#   /tmp/calibrate_dm.log -- detect_many chunked-kernel budget campaign
#
# Afterwards: python tools/check_doc_numbers.py must exit 0 (fix docs that
# drifted from the refreshed sweep).
set -o pipefail
cd "$(dirname "$0")/.."

echo "=== 1/5 goldens (both impls, wide windows) ==="
timeout 5400 python tools/check_goldens.py --impl both --wide \
    --out GOLDENS_TPU.json || exit 1

echo "=== 2/5 headline bench ==="
timeout 1500 python bench.py | tee /tmp/bench_headline.json || exit 1

echo "=== 3/5 full sweep ==="
timeout 10800 python benchmarks.py --out BENCH_SWEEP.json || exit 1

echo "=== 4/5 detect_many wide-budget calibration ==="
timeout 3600 python tools/calibrate_detect_many.py --p 5 7 9 \
    2>&1 | tee /tmp/calibrate_dm.log

echo "=== 5/5 doc-number reconciliation ==="
python tools/check_doc_numbers.py
