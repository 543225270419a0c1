#!/usr/bin/env python3
"""Close-bench analysis: per-query ratios vs (a) the recorded gate —
the FIRST driver-bench time each query ever got, scanned across
BENCH_r*.json in round order — and (b) the previous close bench.

Usage: bench_report.py <close_bench.json_or_log> [prev_close.json] [--strict]

Prints the gate geomean, every >2x gate breach, and every >1.5x
round-over-round regression. Exits nonzero if the bench log contains
errors or recorded no queries. With --strict (the close.sh default
when a prev close is supplied) it ALSO exits nonzero on any NEW gate
breach (one the prev close did not already have) or any >1.5x
regression vs the prev close — the r14o1 failure mode was a close
that printed both and shipped anyway.
"""
import glob
import json
import math
import os
import re
import sys


def extract_json(path):
    """The one {"metric":...} line from a bench log or a raw json file."""
    text = open(path).read()
    i = text.rfind('{"metric"')
    if i < 0:
        sys.exit(f"no bench JSON found in {path}")
    obj, _ = json.JSONDecoder().raw_decode(text[i:])
    return obj


def gate_times(repo_root):
    """query -> first recorded driver-bench seconds, in round order."""
    gates = {}
    # first-recorded rule: driver rounds first (BENCH_r01 is the oldest
    # evidence), then committed builder close benches for the queries
    # the driver's truncated tails never captured
    paths = (sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json"))) +
             sorted(glob.glob(os.path.join(repo_root, "dev",
                                           "bench_*.json"))))
    for p in paths:
        text = open(p).read()
        # driver files escape the bench line inside a "tail" string and
        # may truncate its head, so raw_decode is best-effort and the
        # regex pair-scan is the workhorse
        qs = {}
        i = text.find('{"metric"')
        if i >= 0:
            try:
                obj, _ = json.JSONDecoder().raw_decode(text[i:])
                qs = obj.get("queries", {})
            except Exception:
                qs = {}
        if not qs:
            qs = {m.group(1): float(m.group(2)) for m in re.finditer(
                r'\\?"(q\d+[a-z0-9_]*)\\?":([0-9.]+)', text)}
        for q, t in qs.items():
            gates.setdefault(q, float(t))
    # explicit re-gates: dev/regates.json maps query -> {gate, reason}.
    # A re-gate is a RECORDED decision that the first-recorded time was
    # not a fair contract for the query (e.g. the gate equals one scan
    # but the query's semantics require two); it is applied loudly so a
    # close report never hides one.
    rg_path = os.path.join(repo_root, "dev", "regates.json")
    if os.path.exists(rg_path):
        for q, spec in json.load(open(rg_path)).items():
            old = gates.get(q)
            gates[q] = float(spec["gate"])
            print(f"  REGATE {q}: {old if old is not None else '-'} -> "
                  f"{spec['gate']}s ({spec['reason']})")
    return gates


def main():
    strict = "--strict" in sys.argv
    argv = [a for a in sys.argv if a != "--strict"]
    bench = extract_json(argv[1])
    qs = {k: float(v) for k, v in bench.get("queries", {}).items()}
    errs = bench.get("errors", {})
    if errs:
        print(f"BENCH ERRORS ({len(errs)}): {errs}")
    if not qs:
        sys.exit("bench recorded zero queries")
    print(f"queries: {len(qs)}  total: {sum(qs.values()):.1f}s")

    gates = gate_times(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ratios = {q: t / gates[q] for q, t in qs.items()
              if q in gates and gates[q] > 0}
    breaches = {}
    if ratios:
        gm = math.exp(sum(math.log(r) for r in ratios.values())
                      / len(ratios))
        print(f"gate geomean over {len(ratios)} gated queries: {gm:.3f}x")
        breaches = {q: r for q, r in ratios.items() if r > 2.0}
        for q, r in sorted(breaches.items(), key=lambda kv: -kv[1]):
            print(f"  GATE BREACH {q}: {qs[q]:.2f}s = {r:.1f}x of "
                  f"gate {gates[q]:.2f}s")
        if not breaches:
            print("  zero gate breaches (>2x)")
    ungated = sorted(set(qs) - set(ratios))
    if ungated:
        print(f"  {len(ungated)} queries have no recorded gate yet "
              f"(new this round): {', '.join(ungated[:12])}"
              + (" ..." if len(ungated) > 12 else ""))

    new_breaches, regs = {}, {}
    if len(argv) > 2:
        prev = extract_json(argv[2]).get("queries", {})
        # a breach the prev close ALREADY had is inherited state, not
        # this round's doing; a NEW one is a hard stop under --strict
        prev_breaches = {q for q, t in prev.items()
                         if q in gates and gates[q] > 0
                         and float(t) / gates[q] > 2.0}
        new_breaches = {q: r for q, r in breaches.items()
                        if q not in prev_breaches}
        for q in sorted(new_breaches):
            print(f"  NEW gate breach this round: {q}")
        common = {q: qs[q] / float(prev[q]) for q in qs
                  if q in prev and float(prev[q]) > 0}
        if common:
            gm = math.exp(sum(math.log(r) for r in common.values())
                          / len(common))
            print(f"vs previous close ({len(common)} common): "
                  f"geomean {gm:.3f}x")
            regs = {q: r for q, r in common.items()
                    if r > 1.5 and qs[q] > 0.5}
            for q, r in sorted(regs.items(), key=lambda kv: -kv[1]):
                print(f"  REGRESSION {q}: {float(prev[q]):.2f}s -> "
                      f"{qs[q]:.2f}s ({r:.1f}x)")
            if not regs:
                print("  zero >1.5x regressions (above 0.5s)")
    if strict and (new_breaches or regs):
        print(f"STRICT FAIL: {len(new_breaches)} new gate breach(es), "
              f"{len(regs)} >1.5x regression(s) — fix or revert before "
              f"closing the round")
        sys.exit(1)
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
