"""Compute the standing in-sweep drift gate (BASELINE.md comparison
rule, r13): per-query ratios of a new BENCH_FULL-style sweep vs the
last committed sweep artifact, the sweep-wide median ratio (host
weather indicator), and the >1.25x flag list that the quiet ONLY
min-of-3 protocol then adjudicates.

Usage: python tools/bench_drift.py NEW.json [REF_GIT_SPEC]
  REF_GIT_SPEC defaults to 9ca8228:BENCH_FULL.json (the r16 artifact
  of record, 312.4 s / 210, post-warmup; see the BASELINE.md
  round-16 adjudication ledger). NOTE for r17 adjudication: the r16
  artifact was swept in a FAST host window (median ratio 0.812 vs
  r15), so a next-sweep median noticeably above 1.0 is likely host
  weather reverting — judge flags against the in-sweep median, per
  the standing rule, before touching code.
"""

import json
import statistics
import subprocess
import sys


def load(spec: str) -> dict:
    """A plain path, or a git object spec like '3103e06:BENCH_FULL.json'."""
    try:
        return json.load(open(spec))
    except FileNotFoundError:
        out = subprocess.check_output(["git", "show", spec])
        return json.loads(out)


def main() -> int:
    new_spec = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    ref_spec = sys.argv[2] if len(sys.argv) > 2 else "9ca8228:BENCH_FULL.json"
    new, ref = load(new_spec)["queries"], load(ref_spec)["queries"]
    shared = sorted(set(new) & set(ref))
    ratios = {q: new[q] / ref[q] for q in shared if ref[q] > 0}
    if not ratios:
        print("ERROR: the two sweeps share no comparable queries")
        return 1
    med = statistics.median(ratios.values())
    print(f"shared={len(shared)} new_only={sorted(set(new)-set(ref))}")
    missing = sorted(set(ref) - set(new))
    if missing:
        # a sweep that lost entries must not pass as a clean gate —
        # coverage regressions are exactly what this tool exists to
        # catch
        print(f"MISSING from new sweep ({len(missing)}): {missing}")
    print(f"median_ratio={med:.3f}  (uniform band = host weather)")
    flags = {q: r for q, r in ratios.items() if r > 1.25}
    for q in sorted(flags, key=lambda q: -flags[q]):
        print(f"FLAG {q}: {ref[q]:.2f} -> {new[q]:.2f}  ({flags[q]:.2f}x)")
    print(f"flags_over_1.25x={len(flags)}  over_1.5x="
          f"{sum(1 for r in flags.values() if r > 1.5)}")
    # tail-aging check: are tail-position entries inside the median band?
    tail_ratios = [ratios[q] for q in list(new)[-15:] if q in ratios]
    if tail_ratios:
        tail_med = statistics.median(tail_ratios)
        print(f"tail15_median_ratio={tail_med:.3f} vs sweep {med:.3f}")
    else:
        print("tail15: no comparable entries (tail is all-new)")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
