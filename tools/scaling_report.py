"""Render BENCH_SCALING.json into the BENCH_SCALING.md table.

Usage: python tools/scaling_report.py /tmp/BENCH_SCALING.json > BENCH_SCALING.md
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    with open(sys.argv[1]) as f:
        d = json.load(f)
    rows = sorted(
        d.items(), key=lambda kv: -(kv[1]["sec"].get("1.0") or 0)
    )
    print("| query | sf0.1 s | sf0.3 s | sf1.0 s | slope 0.3→1.0 |"
          " slope 0.1→1.0 |")
    print("|---|---|---|---|---|---|")
    for n, v in rows:
        s = v["sec"]
        def fmt(x):
            return f"{x:.2f}" if x and x > 0 else "ERR"
        print(
            f"| {n} | {fmt(s.get('0.1'))} | {fmt(s.get('0.3'))} |"
            f" {fmt(s.get('1.0'))} | {v['slope_03_10']} |"
            f" {v['slope_01_10']} |"
        )


if __name__ == "__main__":
    main()
