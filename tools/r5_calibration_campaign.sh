#!/bin/bash
# r5 frontier campaign (VERDICT r4 task 6): probe the OPEN geometries —
# ME p=9 at 4K lanes, ME p=7 at 8K lanes, and the >4,320-row class
# (portrait 8K) — at shrunk nc. Sequential on purpose: compiles share
# the single-queue compile helper. Each probe is one forced (nc, strip)
# compile at the REAL frame height (short probes only bound short
# frames; scoped VMEM grows with rows).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_calibration.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 900 python tools/calibrate_detect_many.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
: > "$LOG"
# ME p=9 @ 4K (2160x3840, lanes 3968): facts stop at 2688 lanes. nc=1 strip 8.
# r5 result: FAIL — 19.15M scoped vs the 16M limit at the MINIMUM config;
# provably VMEM-maximal (docs/PERFORMANCE.md frontier table).
run --probe 1,8 --mask me --p 9 --rows 2160 --cols 3840
# ME p=7 @ 8K (4320x7680, lanes 7808): facts stop at 3968. nc=2 then nc=1.
# r5 result: both FAIL (nc=1: 24.83M scoped) — provably VMEM-maximal.
run --probe 2,8 --mask me --p 7 --rows 4320 --cols 7680
run --probe 1,8 --mask me --p 7 --rows 4320 --cols 7680
# portrait 8K (7680 rows x 4320 cols, lanes 4352): the >4,320-row class.
# r5 results: all ok -> DETECT_MANY_PROVEN facts.
run --probe 8,8 --mask me --p 3 --rows 7680 --cols 4320
run --probe 4,8 --mask me --p 5 --rows 7680 --cols 4320
run --probe 2,8 --mask me --p 7 --rows 7680 --cols 4320
run --probe 4,8 --mask nvf --p 9 --rows 7680 --cols 4320
# tall-narrow (7680 x 1920): keep the fast 1080p-class picks at tall frames.
# r5 results: ok at every window; ME p=7 strip 24 FAILS at 7,680 rows (the
# rows trap) — strip 16 is the tall witness.
run --probe 8,48 --mask me --p 3 --rows 7680 --cols 1920
run --probe 8,40 --mask me --p 5 --rows 7680 --cols 1920
run --probe 8,16 --mask me --p 7 --rows 7680 --cols 1920
run --probe 8,8  --mask me --p 9 --rows 7680 --cols 1920
run --probe 8,40 --mask nvf --p 9 --rows 7680 --cols 1920
echo "CAMPAIGN DONE" >> "$LOG"
