"""Bench-gate contract (VERDICT r07 #1): the committed BENCH_FULL_r{N}
capture and the committed BASELINE_r{N} per-query min fold must pass the
gate THEY claim, mechanically recomputed from the two files:

- queries whose folded min is >= 1 s gate per-query at <= 2x the fold
  (real plans are steady at this size; a 2x excursion means a regressed
  plan, not noise)
- sub-second queries gate on their AGGREGATE (sum of capture <= 2x sum of
  fold): individually they sit inside the host's scheduling noise floor
  (single runs show 2-3x spikes on a different query set each run - see
  the BASELINE fold policy strings), so a per-query gate on them measures
  the host, not the plan.

This test is the enforcement the round-7 verdict asked for: the artifact
pair ships only if it passes its own stated gate.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest(pattern: str) -> str | None:
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    return paths[-1] if paths else None


def _load_pair():
    bench_path = _newest("BENCH_FULL_r*.json") or os.path.join(
        REPO, "BENCH_FULL.json"
    )
    base_path = _newest("BASELINE_r*.json")
    with open(bench_path) as f:
        bench = json.load(f)["queries"]
    with open(base_path) as f:
        base = json.load(f)
    base = base.get("queries", base)
    base = {k: v for k, v in base.items() if isinstance(v, (int, float))}
    return bench_path, base_path, bench, base


def test_committed_bench_passes_its_own_gate():
    bench_path, base_path, bench, base = _load_pair()
    shared = sorted(set(bench) & set(base))
    assert shared, f"no shared queries between {bench_path} and {base_path}"

    big_violations = []
    sub_bench = sub_fold = 0.0
    for name in shared:
        fold, got = base[name], bench[name]
        if fold >= 1.0:
            if got > 2.0 * fold:
                big_violations.append((name, fold, got, round(got / fold, 2)))
        else:
            sub_bench += got
            sub_fold += fold
    assert not big_violations, (
        f"queries with >=1s folds over the 2x gate in {bench_path} "
        f"vs {base_path}: {big_violations}"
    )
    if sub_fold > 0:
        ratio = sub_bench / sub_fold
        assert ratio <= 2.0, (
            f"sub-second aggregate {sub_bench:.1f}s is {ratio:.2f}x the "
            f"folded {sub_fold:.1f}s (gate 2x)"
        )


def test_every_benched_query_has_a_baseline_entry_or_is_new():
    """New queries may appear in the capture before their first fold; a
    FOLDED query missing from the capture means the bench silently
    dropped coverage."""
    bench_path, base_path, bench, base = _load_pair()
    missing = sorted(set(base) - set(bench))
    assert not missing, (
        f"queries folded in {base_path} but absent from {bench_path}: "
        f"{missing}"
    )
