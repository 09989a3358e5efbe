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
_NON_QUERY_KEYS = {
    "n", "rc", "cpus", "sf", "value", "rows", "sec", "rows_per_sec",
    # summary/anchor scalars that would otherwise regex-parse as query
    # timings from a truncated driver tail (ADVICE r9)
    "median_sec", "sec_per_query", "anchor_drift", "anchor_drift_max",
    "after", "at", "n_queries", "n_errors",
}
# anchor maps in a truncated tail hold real query NAMES (the anchors are
# themselves headline queries), so they must be stripped wholesale
# before the regex pass — _NON_QUERY_KEYS can't catch them by name
_ANCHOR_SPAN = re.compile(
    r'"anchors_(?:start|end)":\s*\{[^{}]*\}|"anchors_mid":\s*\[[^\[\]]*\]'
)

#: documented same-day host variance envelope (see the r6-r9 attribution
#: notes in bench.py): a cross-file anchor factor beyond this is NOT
#: plain drift — normalizing by it would let a uniform code regression
#: (or a regression in an anchor's own lineage) suppress every flag
_MAX_AUTO_FACTOR = 1.25


def _anchors(doc: dict) -> dict[str, float]:
    """Per-anchor time: median over ALL recorded samples of that anchor
    (sweep start, the interleaved anchors_mid series, sweep end) — the
    median estimates the host's typical state DURING the sweep, which
    is the state the per-query timings saw (r9's endpoint-only pair
    read 1.03 while the middle ran 1.25x slow). Empty dict when the
    file predates anchors (r8-)."""
    samples: dict[str, list[float]] = {}
    for key in ("anchors_start", "anchors_end"):
        for n, t in (doc.get(key) or {}).items():
            samples.setdefault(n, []).append(float(t))
    for row in doc.get("anchors_mid") or []:
        if isinstance(row, dict) and "name" in row and "sec" in row:
            samples.setdefault(str(row["name"]), []).append(float(row["sec"]))
    out = {}
    for n, ts in samples.items():
        ts.sort()
        mid = len(ts) // 2
        out[n] = ts[mid] if len(ts) % 2 else (ts[mid - 1] + ts[mid]) / 2.0
    return out


def _self_drift(doc: dict) -> float | None:
    """The file's own recorded intra-sweep drift (worst anchor sample vs
    sweep start, r10+; falls back to the endpoint-pair drift). Used to
    warn when a file's anchors were recorded in a spike window — the
    r9->r10 lesson: normalizing against an anomalous REFERENCE inflates
    honest ratios just as surely as a slow current host."""
    v = doc.get("anchor_drift_max", doc.get("anchor_drift"))
    return float(v) if isinstance(v, (int, float)) else None


def load_queries(
    path: str,
) -> tuple[dict[str, float], dict[str, float], float | None]:
    """Returns (per-query timings, per-anchor timings, intra-sweep drift)."""
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("queries"), dict):
            return (
                {k: float(v) for k, v in doc["queries"].items()},
                _anchors(doc),
                _self_drift(doc),
            )
        # driver wrapper: prefer a parseable inner line, fall back to the
        # truncated tail (regex over "name": seconds pairs)
        for key in ("parsed", "tail"):
            inner = doc.get(key)
            if isinstance(inner, dict) and isinstance(inner.get("queries"), dict):
                return (
                    {k: float(v) for k, v in inner["queries"].items()},
                    _anchors(inner),
                    _self_drift(inner),
                )
            if isinstance(inner, str):
                pairs = {
                    k: float(v)
                    for k, v in _PAIR.findall(_ANCHOR_SPAN.sub("", inner))
                    if k not in _NON_QUERY_KEYS
                }
                if pairs:
                    # regex recovery can't tell anchor maps from query
                    # maps; leave anchors empty (factor falls back to 1)
                    return pairs, {}, None
    raise SystemExit(f"{path}: no per-query timings found")


def host_factor(
    anchors_before: dict[str, float], anchors_after: dict[str, float]
) -> float:
    """Median after/before ratio over the common anchors: how much the
    HOST changed between the two recordings. 1.0 when either file
    predates anchors. Per-query deltas are divided by this before
    flagging, so a uniformly slower host doesn't read as regressions.
    Pairs where either side is <= 0 are skipped (bench.py rounds to 4
    decimals, so a sub-0.1ms anchor records 0.0 — ADVICE r9)."""
    ratios = sorted(
        anchors_after[n] / anchors_before[n]
        for n in set(anchors_before) & set(anchors_after)
        if anchors_before[n] > 0 and anchors_after[n] > 0
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
    ap.add_argument("--force-anchor", action="store_true",
                    help="normalize even when the anchor factor exceeds the "
                         "documented host-variance envelope")
    args = ap.parse_args()

    before, anchors_b, self_b = load_queries(args.before)
    after, anchors_a, self_a = load_queries(args.after)
    common = sorted(set(before) & set(after))
    if not common:
        print("no common queries between the two files", file=sys.stderr)
        return 1

    drift = 1.0 if args.no_anchor else host_factor(anchors_b, anchors_a)
    for label, sd in (("before", self_b), ("after", self_a)):
        if sd is not None and sd > _MAX_AUTO_FACTOR:
            # the r9->r10 lesson: a reference recorded mid-spike makes
            # its anchors anomalous, and normalizing against them
            # inflates honest ratios — surface it, don't silently trust
            print(
                f"WARNING: {label} file's own intra-sweep anchor drift is "
                f"{sd:.3f}x (> {_MAX_AUTO_FACTOR}) — its anchors were recorded "
                "on an unstable host; treat normalized flags as suspect and "
                "A/B before blaming code"
            )
    if not args.force_anchor and not (1 / _MAX_AUTO_FACTOR <= drift <= _MAX_AUTO_FACTOR):
        # a factor outside the documented envelope is NOT plain host
        # drift — dividing by it would let a uniform code regression
        # (or one in an anchor's own lineage, which self-normalizes to
        # ~1.0) silently suppress every flag (ADVICE r9). Refuse to
        # normalize: flags then demand manual adjudication, the safe
        # direction. --force-anchor overrides after that adjudication.
        print(
            f"WARNING: anchor host factor {drift:.3f}x is outside the "
            f"documented variance envelope (1/{_MAX_AUTO_FACTOR}..{_MAX_AUTO_FACTOR}); "
            "NOT auto-normalizing — adjudicate manually (A/B protocol) or "
            "rerun with --force-anchor"
        )
        drift = 1.0

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
