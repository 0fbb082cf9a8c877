"""Regression gate for bench.py output — the reference repo's CI
policy (perf/compare-results.js:11: fail when a benchmark runs >1.25x
slower than its recorded baseline), applied to ISOLATED per-query
times (bench.py forks a fresh JVM per query, so its numbers ARE
isolated numbers; VERDICT r3 #8).

Usage:
    python tools/bench_compare.py CURRENT.json [REFERENCE.json]

CURRENT.json is a bench.py output line (or a driver BENCH_r*.json with
a "parsed" field). REFERENCE defaults to BENCH_REFERENCE.json at the
repo root — update that file deliberately when a slowdown is an
accepted trade, exactly like the reference's recorded perf baselines.

Exit 1 when any shared query exceeds THRESHOLD (default 1.25, env
BENCH_COMPARE_THRESHOLD). The sandbox host shows up to ~50% run-to-run
variance (BENCH.md "noise" note); best-of-2 sampling absorbs some of
it, the rest is why the threshold matches the reference's 1.25 rather
than something tighter.
"""

from __future__ import annotations

import json
import os
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_r*.json wrapper
        d = d["parsed"]
    return d


def _queries(path: str) -> dict:
    d = _load(path)
    return d.get("queries", d)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cur_doc = _load(sys.argv[1])
    cur = cur_doc.get("queries", cur_doc)
    gate = cur_doc.get("regression_gate")
    if gate:
        # bench.py already adjudicated with best-of-N forked reps
        # (VERDICT r4 #2): recorded numbers are post-retry minima; echo
        # its embedded verdict alongside the recomputation below.
        rr = gate.get("reps") or {}
        rep_note = f", retried: {rr}" if rr else ""
        print(f"[embedded gate] pass={gate.get('pass')} "
              f"failures={gate.get('failures')}{rep_note}")
    ref_path = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_REFERENCE.json")
    )
    ref = _queries(ref_path)
    threshold = float(os.environ.get("BENCH_COMPARE_THRESHOLD", "1.25"))
    # same absolute jitter floor as bench.py's embedded gate: a ratio
    # breach under this delta on a forked fresh-JVM measurement is
    # scheduling/JIT noise, not code (sub-second queries especially)
    min_delta = float(os.environ.get("BENCH_GATE_MIN_DELTA", "0.5"))
    failures = []
    for name in sorted(set(cur) & set(ref)):
        c, r = cur[name], ref[name]
        if not isinstance(c, (int, float)) or not isinstance(r, (int, float)):
            continue
        ratio = c / max(r, 1e-9)
        flag = ("SLOWER" if ratio > threshold and c - r >= min_delta
                else ("faster" if ratio < 1 / threshold else "ok"))
        print(f"{name:32s} ref={r:8.2f}s cur={c:8.2f}s  x{ratio:.2f}  {flag}")
        if flag == "SLOWER":
            failures.append(name)
    missing = sorted(set(ref) - set(cur))
    for name in missing:
        print(f"{name:32s} MISSING from current run")
    if failures or missing:
        print(f"FAIL: {failures + missing}")
        return 1
    print("PASS: no query slower than "
          f"{threshold}x its recorded baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
