#!/usr/bin/env python
"""Cross-round bench guard: diff two bench result files and fail on
per-query regressions above a threshold (default 1.5x) so drifts get
flagged the round they appear instead of being noticed by a reviewer
two rounds later.

Accepts either format:
  - bench.py's complete payload ({"queries": {...}, ...}) — since r7
    that is `bench_full.json`, written beside bench.py on every run and
    committed per round (PREFER this for cross-round diffs: it always
    carries the whole query map)
  - the driver's BENCH_r{N}.json wrapper, whose "tail" string holds a
    (possibly truncated) copy of the stdout line — per-query pairs are
    regex-recovered, and only names present in BOTH files compare.
    From r7 the stdout line is compact (summary + slowest queries), so
    the wrapper alone covers only the expensive tail; diff the
    committed bench_full.json files for full coverage.

Usage:
  python scripts/bench_diff.py BENCH_r05.json bench_now.json [--threshold 1.5]
  python scripts/bench_diff.py BENCH_r04.json BENCH_r05.json

Exit status: 0 = no regression above threshold, 1 = regressions listed
on stdout (each one needs a PLANS.md-visible cause or a fix). Timings
under --floor seconds (default 0.2) are skipped — sub-200ms numbers sit
inside local run-to-run jitter and would only produce noise.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_PAIR = re.compile(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)')
_NON_QUERY_KEYS = {"n", "rc", "cpus", "sf", "value", "rows", "sec", "rows_per_sec"}


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("queries"), dict):
            return {k: float(v) for k, v in doc["queries"].items()}
        # driver wrapper: prefer a parseable inner line, fall back to the
        # truncated tail (regex over "name": seconds pairs)
        for key in ("parsed", "tail"):
            inner = doc.get(key)
            if isinstance(inner, dict) and isinstance(inner.get("queries"), dict):
                return {k: float(v) for k, v in inner["queries"].items()}
            if isinstance(inner, str):
                pairs = {
                    k: float(v)
                    for k, v in _PAIR.findall(inner)
                    if k not in _NON_QUERY_KEYS
                }
                if pairs:
                    return pairs
    raise SystemExit(f"{path}: no per-query timings found")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.2,
                    help="skip queries faster than this in BOTH files (sec)")
    args = ap.parse_args()

    before = load_queries(args.before)
    after = load_queries(args.after)
    common = sorted(set(before) & set(after))
    if not common:
        print("no common queries between the two files", file=sys.stderr)
        return 1

    regressions = []
    for name in common:
        b, a = before[name], after[name]
        if b < args.floor and a < args.floor:
            continue
        if b > 0 and a / b > args.threshold:
            regressions.append((name, b, a, a / b))

    tb, ta = sum(before[n] for n in common), sum(after[n] for n in common)
    print(
        f"common queries: {len(common)}  total {tb:.1f}s -> {ta:.1f}s "
        f"({ta / tb:.2f}x)"
    )
    for name, b, a, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(f"REGRESSION {name}: {b:.3f}s -> {a:.3f}s ({ratio:.2f}x)")
    if regressions:
        print(
            f"{len(regressions)} quer{'y' if len(regressions) == 1 else 'ies'} "
            f"regressed beyond {args.threshold}x — each needs a named "
            f"plan-level cause or a fix."
        )
        return 1
    print(f"no regressions beyond {args.threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
