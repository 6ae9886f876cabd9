#!/usr/bin/env python3
"""Cross-check documented performance numbers against committed artifacts.

The r3 VERDICT's core complaint: docs cited sweep rows that did not exist
and quoted the same headline three inconsistent ways. This tool makes the
"every documented number traces to a committed artifact" bar mechanically
checkable:

1. every backticked sweep-row name mentioned in the docs must exist in the
   committed BENCH_SWEEP.json;
2. every explicit `<row>: N fps`-style quote (and the README/CLAUDE.md
   ledger headline) must match the artifact within a tolerance (default
   5% — sweep reruns jitter a few percent on the tunneled chip; the doc
   text should be refreshed when it drifts).

Run in CI-style after refreshing the sweep:

    python tools/check_doc_numbers.py           # exit 1 on any mismatch
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "CLAUDE.md", "docs/PERFORMANCE.md", "docs/PARITY.md",
        "docs/MULTICHIP.md", "docs/ROBUSTNESS.md"]

ROW_PREFIXES = ("embed_detect_", "detect_many_", "video_embed_",
                "identify_", "batched_")


def main() -> int:
    sweep_path = os.path.join(REPO, "BENCH_SWEEP.json")
    sweep = json.load(open(sweep_path))
    rows: dict = sweep["results"]
    failures = []
    checked = 0

    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        text = open(path).read()

        # 1. referenced row names must exist in the artifact; `p{5,7,9}`
        # brace alternations expand to one name each
        for match in re.finditer(r"`([a-z0-9_]+(?:\{[0-9,]+\})?[a-z0-9_]*)`",
                                 text):
            raw = match.group(1)
            brace = re.search(r"\{([0-9,]+)\}", raw)
            names = ([raw.replace(brace.group(0), alt)
                      for alt in brace.group(1).split(",")]
                     if brace else [raw])
            for name in names:
                if not name.startswith(ROW_PREFIXES):
                    continue
                if name not in rows:
                    failures.append(
                        f"{doc}: cites sweep row `{name}` which is NOT in "
                        f"BENCH_SWEEP.json")
                elif "error" in rows[name]:
                    # benchmarks.py records failed rows as {"error": ...}
                    # instead of aborting the sweep; a doc citing one is
                    # quoting a measurement that never happened
                    failures.append(
                        f"{doc}: cites sweep row `{name}` whose committed "
                        f"measurement FAILED: {rows[name]['error']!r:.100}")
                else:
                    checked += 1

        # 2. explicit quotes "`row` ... N fps" within the same sentence
        for match in re.finditer(
                r"`([a-z0-9_]+)`[^`.\n]{0,120}?([\d,]+(?:\.\d+)?)\s*fps",
                text):
            name, quoted = match.group(1), match.group(2)
            if name not in rows or "fps" not in rows[name]:
                continue
            quoted_value = float(quoted.replace(",", ""))
            actual = float(rows[name]["fps"])
            if actual and abs(quoted_value - actual) / actual > 0.05:
                failures.append(
                    f"{doc}: quotes `{name}` at {quoted_value} fps; "
                    f"BENCH_SWEEP.json says {actual} fps (>5% apart)")
            else:
                checked += 1

    print(f"checked {checked} doc citations against "
          f"{len(rows)} sweep rows ({sweep.get('device', '?')})")
    for failure in failures:
        print(f"MISMATCH: {failure}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
