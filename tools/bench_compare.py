"""Per-query regression report between two bench result files.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r02.json

Accepts either the raw ``bench.py`` JSON line or the driver's wrapper
(``{"parsed": {...}}``). Prints headline + per-query deltas and exits
non-zero when any query regressed beyond ``--threshold`` (default
1.5x) — the local guard-rail for "a correct-but-slower operator is not
done".
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = _load(args.old), _load(args.new)

    def line(name: str, a: float | None, b: float | None) -> str:
        if a is None or b is None:
            return f"{name:28s} {a if a is not None else '—':>8} -> {b if b is not None else '—':>8}"
        ratio = b / a if a else float("inf")
        flag = "  REGRESSED" if ratio > args.threshold else ""
        return f"{name:28s} {a:8.2f} -> {b:8.2f}  ({ratio:4.2f}x){flag}"

    print(line("headline_sec", old.get("value"), new.get("value")))
    print(line("docs_per_sec", old.get("docs_per_sec"), new.get("docs_per_sec")))
    regressed = []
    qs = sorted(set(old.get("queries", {})) | set(new.get("queries", {})))
    for q in qs:
        a, b = old.get("queries", {}).get(q), new.get("queries", {}).get(q)
        print(line(q, a, b))
        if a and b and b / a > args.threshold:
            regressed.append(q)
    if old.get("value") and new.get("value") and new["value"] / old["value"] > args.threshold:
        regressed.append("headline")
    print("\nregressed beyond threshold:", regressed or "none")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
