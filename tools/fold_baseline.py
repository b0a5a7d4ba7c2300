"""Fold bench runs into the next BASELINE_r{N}.json per the house policy:

- pre-existing queries keep min(previous fold, this round's runs)
- queries whose ENGINE-SIDE PLAN deliberately changed this round enter at
  this round's best (their historical min timed a different plan)
- new queries enter at this round's best

Usage: python tools/fold_baseline.py --prev BASELINE_r09.json \
         --runs run1.json run2.json ... --out BASELINE_r10.json \
         --plan-changed e24_ivfpq_topk,e24b_ivfpq_refine,t43_pmi_collocations \
         --policy "..."
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True)
    ap.add_argument("--runs", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--plan-changed", default="")
    ap.add_argument("--policy", required=True)
    args = ap.parse_args()

    with open(args.prev) as f:
        prev = json.load(f)
    prev_q = prev.get("queries", prev)
    prev_q = {k: v for k, v in prev_q.items() if isinstance(v, (int, float))}

    runs = []
    for p in args.runs:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    plan_changed = {s for s in args.plan_changed.split(",") if s}

    names = set(prev_q)
    for r in runs:
        names |= set(r)
    out_q = {}
    for name in sorted(names):
        round_best = min((r[name] for r in runs if name in r), default=None)
        if name in plan_changed or name not in prev_q:
            assert round_best is not None, f"{name} missing from all runs"
            out_q[name] = round_best
        elif round_best is None:
            out_q[name] = prev_q[name]
        else:
            out_q[name] = min(prev_q[name], round_best)

    with open(args.out, "w") as f:
        json.dump({"policy": args.policy, "queries": out_q}, f, indent=1)
    print(f"wrote {args.out}: {len(out_q)} queries, "
          f"fold sum {sum(out_q.values()):.1f}s")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
