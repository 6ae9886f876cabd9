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

echo "=== 1/6 goldens (both impls, wide windows) ==="
timeout 5400 python tools/check_goldens.py --impl both --wide \
    --out GOLDENS_TPU.json || exit 1

echo "=== 2/6 headline bench ==="
timeout 1500 python bench.py | tee /tmp/bench_headline.json || exit 1

echo "=== 3/6 full sweep ==="
# exit 2 = some rows recorded {"error": ...} (e.g. a tunnel hiccup);
# completed rows are flushed incrementally — keep going, re-run the
# failed rows later with `benchmarks.py --only <row> ...` (merges).
timeout 10800 python benchmarks.py --out BENCH_SWEEP.json
[ $? -eq 1 ] && exit 1

echo "=== 4/6 detect_many wide-budget calibration ==="
timeout 3600 python tools/calibrate_detect_many.py --p 5 7 9 \
    2>&1 | tee /tmp/calibrate_dm.log

echo "=== 5/6 pinned AOT side-cache hot start (4K-3872 class) ==="
timeout 1800 python tools/measure_hot_start.py --rows 2160 --cols 3872 \
    2>&1 | tee /tmp/hot_start.log

echo "=== 6/6 doc-number reconciliation ==="
python tools/check_doc_numbers.py

# Remaining manual steps after this script:
#  - append new chip-compiled facts to fused.DETECT_MANY_PROVEN from
#    /tmp/calibrate_dm.log (tuples (nc, rows, lanes, plane) printed by
#    `calibrate_detect_many.py --probe NC,STRIP` at the REAL frame
#    height), then re-run the probe to confirm admission, add parity tests
#  - reconcile every doc number to the refreshed BENCH_SWEEP.json until
#    check_doc_numbers exits 0 (one consistent p=5 headline in
#    README/PARITY/CLAUDE.md)
#  - paste /tmp/hot_start.log numbers into docs/PERFORMANCE.md
#  - optional: bench.py --profile /tmp/prof + pid3/tid3 aggregation for
#    the p=3 glue attack (r3 VERDICT item 7); WIDE_TAIL_BF16 experiments
#    (item 8: flip the flag, re-bisect tail_budget p=7/9, measure)
