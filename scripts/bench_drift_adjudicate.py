#!/usr/bin/env python
"""Anchor-vs-anchor drift adjudication for the r9 -> r10 suite rise
(round-10 verdict ask #1).

BENCH_r10 totalled 111.5 s vs r9's 72.2 s; ~18-19 s is the 10 r10-new
keys, but ~15-20 s of broad drift on PRE-EXISTING keys (worst: the
shingle-plane dedup family) was never attributed — the r10 sweeps and
the r9 driver number ran on different days/machine regimes, so
code-change vs machine-regime was confounded.

This script removes the confound: it runs the SAME 3-sweep protocol
(scripts/bench_variance.py's) on BOTH code versions on TODAY'S
machine, ALTERNATING r9/HEAD sweeps so slow regime drift over the
~1 h run cancels instead of loading onto one side:

    sweep order: r9, HEAD, r9, HEAD, r9, HEAD

Both code versions run from pinned git worktrees (32b4e89 = the r9
round-end commit; 74692f1 = the r10 round-end commit), so builder
edits in the live tree during the ~1 h run can never leak into a
sweep. Per key present in BOTH versions, the per-key MIN across
sweeps (bench.py's own steady-state estimate) is compared; keys only
in HEAD are priced separately as "r10-new". Output:
bench_results/drift_r9_r10.json with per-key rows and a machine-
matched verdict — any r9-vs-HEAD gap measured here IS in the code
(or the suite composition around it), never the machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R9_ROOT = os.path.join(ROOT, ".drift_r9_worktree")
R10_ROOT = os.path.join(ROOT, ".drift_r10_worktree")
SF_DIR = "/root/testdata/sf0.1"
N_SWEEPS = 3


def run_sweep(root: str, tag: str, i: int) -> tuple[float, dict]:
    per_query = os.path.join(root, "bench_results", "last_bench_sf0.1.json")
    if os.path.exists(per_query):
        os.unlink(per_query)
    # pin BOTH driver and executor-worker module resolution to this
    # sweep's worktree: the committed __spark_entry__ hardcodes
    # /root/repo on sys.path (patched in the worktrees to
    # self-reference), and local-mode python workers resolve pickled
    # closures via PYTHONPATH — without the pin an r9 sweep unpickles
    # r10 modules (observed: AttributeError _gram_acc)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, PYTHONPATH=root)
    env.pop("SPARK_GRAFT_BENCH_COMMIT", None)
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, cwd=root, capture_output=True, text=True, check=True)
    line = json.loads(out.stdout.strip().splitlines()[-1])
    with open(per_query) as f:
        qmap = json.load(f)["queries"]
    print(f"{tag} sweep {i}: total {line['value']}s ({len(qmap)} keys)",
          file=sys.stderr, flush=True)
    return line["value"], qmap


def main() -> None:
    runs: dict[str, list] = {"r9": [], "head": []}
    for i in range(N_SWEEPS):
        runs["r9"].append(run_sweep(R9_ROOT, "r9", i + 1))
        runs["head"].append(run_sweep(R10_ROOT, "head", i + 1))

    r9_keys = set(runs["r9"][0][1])
    head_keys = set(runs["head"][0][1])
    shared = sorted(r9_keys & head_keys)
    rows = {}
    for k in shared:
        r9_vals = [round(q[k], 3) for _, q in runs["r9"]]
        hd_vals = [round(q[k], 3) for _, q in runs["head"]]
        r9_min, hd_min = min(r9_vals), min(hd_vals)
        delta = round(hd_min - r9_min, 3)
        # same machine, same hour, alternating order: a HEAD min above
        # the r9 max is code/suite-composition, not regime
        verdict = ("code" if hd_min > max(r9_vals) + 0.05 and
                   delta > 0.15 * max(r9_min, 0.2)
                   else "noise")
        rows[k] = {"r9_sweeps": r9_vals, "head_sweeps": hd_vals,
                   "r9_min": r9_min, "head_min": hd_min,
                   "delta": delta, "verdict": verdict}
    new_keys = {k: {"head_sweeps": [round(q[k], 3)
                                    for _, q in runs["head"]],
                    "head_min": min(round(q[k], 3)
                                    for _, q in runs["head"])}
                for k in sorted(head_keys - r9_keys)}
    out = {
        "protocol": (f"{N_SWEEPS} alternating r9/HEAD sf0.1 sweeps on one "
                     "machine, one session each via bench.py (2 warm + "
                     "2 timed-min passes); per-key MIN compared"),
        "r9_commit": "32b4e89",
        "totals": {"r9": [t for t, _ in runs["r9"]],
                   "head": [t for t, _ in runs["head"]]},
        "shared_sum": {"r9": round(sum(r["r9_min"]
                                       for r in rows.values()), 2),
                       "head": round(sum(r["head_min"]
                                         for r in rows.values()), 2)},
        "new_keys_sum": round(sum(r["head_min"]
                                  for r in new_keys.values()), 2),
        "keys": rows, "r10_new": new_keys,
    }
    with open(os.path.join(ROOT, "bench_results",
                           "drift_r9_r10.json"), "w") as f:
        json.dump(out, f, indent=1)
    top = sorted(rows.items(), key=lambda kv: -kv[1]["delta"])[:20]
    print(json.dumps({"totals": out["totals"],
                      "shared_sum": out["shared_sum"],
                      "new_keys_sum": out["new_keys_sum"],
                      "top_drift": {k: v["delta"] for k, v in top}}))


if __name__ == "__main__":
    main()
