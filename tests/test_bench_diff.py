"""Cross-round bench guard: anchor-based host-drift normalization (r9).

The recurring r6/r7/r8 pattern was a ~15% uniformly slower host
producing bench_diff flags that each cost a standalone A/B to clear.
With calibration anchors recorded in both artifacts, the guard divides
per-query ratios by the cross-file anchor factor — these tests pin that
arithmetic and the end-to-end flag behavior on synthetic artifacts.
"""

import importlib.util
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(__file__)
_SCRIPT = os.path.join(_HERE, "..", "scripts", "bench_diff.py")

spec = importlib.util.spec_from_file_location("bench_diff", _SCRIPT)
bench_diff = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_diff)


def _artifact(path, queries, anchors_start=None, anchors_end=None, anchors_mid=None):
    doc = {"metric": "headline_queries_total_sec", "queries": queries}
    if anchors_start is not None:
        doc["anchors_start"] = anchors_start
    if anchors_end is not None:
        doc["anchors_end"] = anchors_end
    if anchors_mid is not None:
        doc["anchors_mid"] = anchors_mid
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def _run(before, after, *extra):
    return subprocess.run(
        [sys.executable, _SCRIPT, before, after, *extra],
        capture_output=True,
        text=True,
    )


def test_host_factor_median_of_common_anchor_ratios():
    before = {"a": 1.0, "b": 2.0, "c": 4.0}
    after = {"a": 1.2, "b": 2.2, "c": 4.8}  # ratios 1.2, 1.1, 1.2
    assert bench_diff.host_factor(before, after) == 1.2
    # anchors missing on either side -> neutral factor
    assert bench_diff.host_factor({}, after) == 1.0
    assert bench_diff.host_factor(before, {}) == 1.0
    # only common anchors count
    assert bench_diff.host_factor({"a": 1.0, "z": 9.0}, {"a": 1.5}) == 1.5
    # a 0.0 recording on EITHER side is skipped, never divided (ADVICE
    # r9: bench.py rounds to 4 decimals, a sub-0.1ms anchor records 0.0
    # — previously a 0.0 after-value made the median factor 0.0 and then
    # ZeroDivisionError downstream)
    assert bench_diff.host_factor({"a": 1.0, "b": 1.0}, {"a": 0.0, "b": 1.3}) == 1.3
    assert bench_diff.host_factor({"a": 0.0}, {"a": 1.0}) == 1.0
    assert bench_diff.host_factor({"a": 0.0}, {"a": 0.0}) == 1.0


def test_anchor_per_query_time_is_median_over_all_samples():
    """r10: per-anchor time is the MEDIAN over start + interleaved mid
    series + end — the median estimates the host state the per-query
    timings actually saw (endpoint-only sampling missed r9's mid-sweep
    spike)."""
    doc = {
        "anchors_start": {"a": 1.0, "b": 3.0},
        "anchors_end": {"a": 0.8, "b": 3.5},
    }
    # two samples -> mean of the pair
    assert bench_diff._anchors(doc) == {"a": 0.9, "b": 3.25}
    # mid series participates: a has samples [1.0, 2.0, 0.8] -> 1.0
    doc_mid = {
        "anchors_start": {"a": 1.0},
        "anchors_mid": [{"after": 25, "name": "a", "sec": 2.0}],
        "anchors_end": {"a": 0.8},
    }
    assert bench_diff._anchors(doc_mid) == {"a": 1.0}
    # one-sided recordings still usable
    assert bench_diff._anchors({"anchors_start": {"a": 1.0}}) == {"a": 1.0}
    assert bench_diff._anchors({}) == {}


def test_uniform_host_slowdown_not_flagged_with_anchors(tmp_path):
    """A 20% across-the-board slowdown with anchors drifting the same
    20% must produce zero flags; the same files without anchors (old
    format) must flag — proving normalization is doing the work."""
    queries_b = {"q1": 1.0, "q2": 2.0, "q3": 0.5}
    queries_a = {k: round(v * 1.2, 4) for k, v in queries_b.items()}
    anch_b = {"pricing_summary": 0.5, "docs_fingerprint": 0.4, "ann_ivf_topk": 0.6}
    anch_a = {k: round(v * 1.2, 4) for k, v in anch_b.items()}

    b = _artifact(str(tmp_path / "b.json"), queries_b, anch_b, anch_b)
    a = _artifact(str(tmp_path / "a.json"), queries_a, anch_a, anch_a)
    res = _run(b, a, "--threshold", "1.15")
    assert res.returncode == 0, res.stdout + res.stderr
    assert "anchor host factor: 1.200x" in res.stdout

    b2 = _artifact(str(tmp_path / "b2.json"), queries_b)
    a2 = _artifact(str(tmp_path / "a2.json"), queries_a)
    res2 = _run(b2, a2, "--threshold", "1.15")
    assert res2.returncode == 1
    assert "REGRESSION" in res2.stdout


def test_real_regression_still_flagged_through_anchor_normalization(tmp_path):
    """A query that got 3x slower on a 1.2x-slower host must still flag
    (3/1.2 = 2.5x normalized > 1.5x threshold), while a host-paced query
    whose raw ratio crosses 1.5x must not (1.7/1.2 ≈ 1.42x)."""
    queries_b = {"q1": 1.0, "q2": 2.0}
    queries_a = {"q1": 3.0, "q2": 3.4}  # q1 real regression, q2 host-paced
    anch = {"pricing_summary": 0.5, "ann_ivf_topk": 0.6}
    anch_after = {k: round(v * 1.2, 4) for k, v in anch.items()}
    b = _artifact(str(tmp_path / "b.json"), queries_b, anch, anch)
    a = _artifact(str(tmp_path / "a.json"), queries_a, anch_after, anch_after)
    res = _run(b, a)
    assert res.returncode == 1
    assert "REGRESSION q1" in res.stdout
    assert "REGRESSION q2" not in res.stdout
    assert "drift-normalized" in res.stdout


def test_no_anchor_flag_disables_normalization(tmp_path):
    queries_b = {"q1": 1.0}
    queries_a = {"q1": 1.6}
    anch = {"pricing_summary": 0.5}
    anch_after = {"pricing_summary": 0.6}  # 1.2x host factor
    b = _artifact(str(tmp_path / "b.json"), queries_b, anch, anch)
    a = _artifact(str(tmp_path / "a.json"), queries_a, anch_after, anch_after)
    assert _run(b, a).returncode == 0  # 1.6/1.2 ≈ 1.33x normalized
    res = _run(b, a, "--no-anchor")
    assert res.returncode == 1  # raw 1.6x > 1.5x
    assert "REGRESSION q1" in res.stdout


def test_factor_outside_envelope_refuses_to_normalize(tmp_path):
    """ADVICE r9: an unbounded host factor would let a uniform CODE
    regression (anchors regress with everything else, self-normalizing
    to ~1.0) suppress every flag. Beyond the documented variance
    envelope the guard must refuse to normalize — flags then demand
    manual adjudication — unless --force-anchor says the A/B was done."""
    queries_b = {"q1": 1.0, "q2": 2.0}
    queries_a = {k: round(v * 1.8, 4) for k, v in queries_b.items()}  # uniform 1.8x
    anch = {"pricing_summary": 0.5, "ann_ivf_topk": 0.6}
    anch_after = {k: round(v * 1.8, 4) for k, v in anch.items()}
    b = _artifact(str(tmp_path / "b.json"), queries_b, anch, anch)
    a = _artifact(str(tmp_path / "a.json"), queries_a, anch_after, anch_after)
    res = _run(b, a)
    assert res.returncode == 1, res.stdout + res.stderr
    assert "outside the documented variance envelope" in res.stdout
    assert "REGRESSION q1" in res.stdout and "REGRESSION q2" in res.stdout
    # after a manual A/B pins it to the host, --force-anchor normalizes
    forced = _run(b, a, "--force-anchor")
    assert forced.returncode == 0, forced.stdout + forced.stderr


def test_tail_regex_skips_anchor_maps_and_summary_scalars(tmp_path):
    """ADVICE r9: anchor maps in a truncated driver tail hold REAL query
    names (anchors are headline queries), and new summary scalars
    (anchor_drift, median_sec) parse as numbers — neither may be
    recovered as query timings."""
    tail = (
        '{"value": 70.0, "median_sec": 0.41, "anchor_drift": 1.03, '
        '"anchor_drift_max": 1.25, '
        '"anchors_start": {"pricing_summary": 0.5, "ann_ivf_topk": 1.0}, '
        '"anchors_mid": [{"after": 25, "name": "pricing_summary", "sec": 0.52}], '
        '"anchors_end": {"pricing_summary": 0.51, "ann_ivf_topk": 1.01}, '
        '"queries": {"q1": 1.5, "pricing_summary": 0.55'  # truncated
    )
    path = str(tmp_path / "wrapper.json")
    with open(path, "w") as f:
        json.dump({"tail": tail}, f)
    queries, anchors, self_drift = bench_diff.load_queries(path)
    assert queries == {"q1": 1.5, "pricing_summary": 0.55}
    assert anchors == {}  # regex recovery can't attribute anchor maps
    assert self_drift is None


def test_unstable_reference_file_warns(tmp_path):
    """r9->r10 lesson: a reference artifact recorded mid-spike (its own
    anchor_drift_max above the envelope) makes its anchors anomalous —
    the diff must say so instead of silently normalizing against it."""
    queries = {"q1": 1.0}
    anch = {"pricing_summary": 0.5}
    b = str(tmp_path / "b.json")
    with open(b, "w") as f:
        json.dump({"queries": queries, "anchors_start": anch,
                   "anchors_end": anch, "anchor_drift_max": 1.4}, f)
    a = _artifact(str(tmp_path / "a.json"), {"q1": 1.1}, anch, anch)
    res = _run(b, a)
    assert res.returncode == 0  # 1.1x is no flag either way
    assert "before file's own intra-sweep anchor drift is 1.400x" in res.stdout
