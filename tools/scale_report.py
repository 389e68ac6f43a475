"""Render the scale-up table from the three bench artifacts, so the
README's scaling section is regenerable rather than hand-maintained.

Usage: python tools/scale_report.py [BENCH_1x.json BENCH_4x.json BENCH_16x.json]

Prints the suite-wall summary, a markdown table of the top-cost rows,
and flags any query whose wall exceeds the linear budget (2.5x per 4x
of data, i.e. 6.25x at 16x) — the round-3 verdict's acceptance rule.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    paths = sys.argv[1:4] or ["BENCH_1x_r08.json", "BENCH_4x.json", "BENCH_16x.json"]
    b1, b4, b16 = (json.loads(open(p).read()) for p in paths)
    print(
        f"suite wall: {b1['value']}s (1x) | {b4['value']}s "
        f"({b4['value']/b1['value']:.2f}x at 4x) | {b16['value']}s "
        f"({b16['value']/b1['value']:.2f}x at 16x)\n"
    )
    rows, flagged = [], []
    for k in b1["queries"]:
        t1, t4, t16 = b1["queries"][k], b4["queries"][k], b16["queries"][k]
        r4, r16 = t4 / max(t1, 0.001), t16 / max(t1, 0.001)
        rows.append((k, t1, t4, t16, r4, r16))
        if (r4 > 2.5 and t4 > 1.0) or (r16 > 6.25 and t16 > 2.0):
            flagged.append(k)
    rows.sort(key=lambda r: -r[3])
    print("| query | 1x | 4x | 16x | ratio 4x/16x |")
    print("|---|---|---|---|---|")
    for k, t1, t4, t16, r4, r16 in rows[:12]:
        print(f"| `{k}` | {t1:.2f}s | {t4:.2f}s | {t16:.2f}s | {r4:.1f}x / {r16:.1f}x |")
    print(f"\nover linear budget (needs a written justification): {flagged}")


if __name__ == "__main__":
    main()
