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

Host-drift normalization (r9): when both files carry the calibration
anchors bench.py records (`anchors_start`/`anchors_end`, three
lineage-frozen queries timed at sweep start and end), per-query ratios
are divided by the median cross-file anchor ratio before flagging.
A host that is uniformly 15% slower no longer produces flags that cost
a standalone A/B to clear (the r6/r7/r8 pattern). --no-anchor disables.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_PAIR = re.compile(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)')
_NON_QUERY_KEYS = {"n", "rc", "cpus", "sf", "value", "rows", "sec", "rows_per_sec"}


def _anchors(doc: dict) -> dict[str, float]:
    """Per-anchor time: min of the sweep-start and sweep-end recordings
    (the min is the host's best state that run, matching the min-of-N
    per-query protocol). Empty dict when the file predates anchors (r8-)."""
    start = doc.get("anchors_start") or {}
    end = doc.get("anchors_end") or {}
    return {
        n: min(float(start.get(n, end.get(n))), float(end.get(n, start.get(n))))
        for n in set(start) | set(end)
    }


def load_queries(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """Returns (per-query timings, per-anchor timings)."""
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("queries"), dict):
            return {k: float(v) for k, v in doc["queries"].items()}, _anchors(doc)
        # driver wrapper: prefer a parseable inner line, fall back to the
        # truncated tail (regex over "name": seconds pairs)
        for key in ("parsed", "tail"):
            inner = doc.get(key)
            if isinstance(inner, dict) and isinstance(inner.get("queries"), dict):
                return (
                    {k: float(v) for k, v in inner["queries"].items()},
                    _anchors(inner),
                )
            if isinstance(inner, str):
                pairs = {
                    k: float(v)
                    for k, v in _PAIR.findall(inner)
                    if k not in _NON_QUERY_KEYS
                }
                if pairs:
                    # regex recovery can't tell anchor maps from query
                    # maps; leave anchors empty (factor falls back to 1)
                    return pairs, {}
    raise SystemExit(f"{path}: no per-query timings found")


def host_factor(
    anchors_before: dict[str, float], anchors_after: dict[str, float]
) -> float:
    """Median after/before ratio over the common anchors: how much the
    HOST changed between the two recordings. 1.0 when either file
    predates anchors. Per-query deltas are divided by this before
    flagging, so a uniformly slower host doesn't read as regressions."""
    ratios = sorted(
        anchors_after[n] / anchors_before[n]
        for n in set(anchors_before) & set(anchors_after)
        if anchors_before[n] > 0
    )
    return ratios[len(ratios) // 2] if ratios else 1.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.2,
                    help="skip queries faster than this in BOTH files (sec)")
    ap.add_argument("--no-anchor", action="store_true",
                    help="disable anchor-based host-drift normalization")
    args = ap.parse_args()

    before, anchors_b = load_queries(args.before)
    after, anchors_a = load_queries(args.after)
    common = sorted(set(before) & set(after))
    if not common:
        print("no common queries between the two files", file=sys.stderr)
        return 1

    drift = 1.0 if args.no_anchor else host_factor(anchors_b, anchors_a)

    regressions = []
    for name in common:
        b, a = before[name], after[name]
        if b < args.floor and a < args.floor:
            continue
        if b > 0 and (a / b) / drift > args.threshold:
            regressions.append((name, b, a, (a / b) / drift))

    tb, ta = sum(before[n] for n in common), sum(after[n] for n in common)
    print(
        f"common queries: {len(common)}  total {tb:.1f}s -> {ta:.1f}s "
        f"({ta / tb:.2f}x)"
    )
    if drift != 1.0:
        print(
            f"anchor host factor: {drift:.3f}x "
            f"({len(set(anchors_b) & set(anchors_a))} anchors; per-query "
            f"ratios normalized by it before flagging)"
        )
    for name, b, a, ratio in sorted(regressions, key=lambda r: -r[3]):
        print(
            f"REGRESSION {name}: {b:.3f}s -> {a:.3f}s "
            f"({a / b:.2f}x raw, {ratio:.2f}x drift-normalized)"
        )
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
