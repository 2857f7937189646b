#!/usr/bin/env python3
"""Cross-round bench regression scan — the PARITY.md pinned protocol as a
command instead of a hand-diff.

Compares SAME-COUNT per-query minima between two run-sets of
BENCH_FULL_*.json artifacts (each `{"queries": {name: sec, ...}, ...}`;
negative values mean the query FAILED that run and are excluded from
minima but reported). Usage:

    python3 tools/benchcmp.py --base BENCH_FULL_r19_run*.json \
                              --head BENCH_FULL_r20_run*.json \
                              [--threshold-ratio 2.0] [--floor-sec 0.7] [--top 15]

Exit status: 0 when no carried query regresses past the rule
(head_min > ratio * base_min AND head_min > floor), 1 when any does,
2 on usage/artifact errors. Queries present on only one side are listed
(added/removed) but never violations — the rule applies to carried
queries only. When the two sides carry different run counts the summed
minima are still printed but flagged (min-of-N bias: 3-vs-9 measured
1.188x on identical code — see PARITY.md).
"""
import argparse
import json
import sys


def artifact_error(msg):
    # sys.exit(str) would exit 1, colliding with the regression code
    print(f"benchcmp: {msg}", file=sys.stderr)
    sys.exit(2)


def load_set(paths):
    runs = []
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            artifact_error(f"{p}: {e}")
        if "queries" not in d or not isinstance(d["queries"], dict):
            artifact_error(f"{p} has no per-query map")
        # a structurally-valid artifact with a non-numeric timing must be
        # exit 2 (artifact error), never a TypeError traceback exiting 1 —
        # 1 is reserved for a real regression (r20 ADVICE low)
        for name, v in d["queries"].items():
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                artifact_error(f"{p}: query {name!r} has non-numeric "
                               f"timing {v!r}")
        runs.append(d["queries"])
    return runs


def minima(runs):
    """Per-query min over runs, skipping failed (negative) samples."""
    out, failed = {}, set()
    for qs in runs:
        for name, v in qs.items():
            if v < 0:
                failed.add(name)
                continue
            if name not in out or v < out[name]:
                out[name] = v
    return out, failed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", nargs="+", required=True,
                    help="prior round's BENCH_FULL run files")
    ap.add_argument("--head", nargs="+", required=True,
                    help="this round's BENCH_FULL run files")
    ap.add_argument("--threshold-ratio", type=float, default=2.0)
    ap.add_argument("--floor-sec", type=float, default=0.7)
    ap.add_argument("--top", type=int, default=15,
                    help="rows to print in the biggest-moves table")
    args = ap.parse_args()

    base_runs = load_set(args.base)
    head_runs = load_set(args.head)
    base, base_failed = minima(base_runs)
    head, head_failed = minima(head_runs)

    carried = sorted(set(base) & set(head))
    added = sorted(set(head) - set(base))
    removed = sorted(set(base) - set(head))

    same_count = len(base_runs) == len(head_runs)
    print(f"base: {len(base_runs)} runs, {len(base)} queries "
          f"({len(base_failed)} with failed samples)")
    print(f"head: {len(head_runs)} runs, {len(head)} queries "
          f"({len(head_failed)} with failed samples)")
    if not same_count:
        print(f"WARNING: run counts differ ({len(base_runs)} vs "
              f"{len(head_runs)}) — min-of-N bias applies (PARITY.md "
              f"measured 1.188x for 3-vs-9 on identical code); summed "
              f"totals below are NOT a clean comparison")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    # failed samples are loud: a negative bench value is a breakage
    # masquerading as a timing, never fold it into a speedup claim
    for name in sorted(head_failed):
        print(f"FAILED-SAMPLE head: {name}")

    if not carried:
        artifact_error("base and head share no carried queries — "
                       "nothing to compare")
    sum_base = sum(base[q] for q in carried)
    sum_head = sum(head[q] for q in carried)
    drift = (f"({(sum_head / sum_base - 1) * 100:+.1f}%)"
             if sum_base > 0 else "(base sum is 0)")
    print(f"\ncarried {len(carried)} queries, summed minima: "
          f"{sum_base:.1f} s -> {sum_head:.1f} s {drift}")

    def show_rows(rows):
        for q in rows:
            print(f"  {q:40s} {base[q]:7.2f} -> {head[q]:7.2f} "
                  f"({head[q] - base[q]:+.2f})")
    regress = sorted((q for q in carried if head[q] - base[q] >= 0.05),
                     key=lambda q: base[q] - head[q])
    improve = sorted((q for q in carried if base[q] - head[q] >= 0.05),
                     key=lambda q: head[q] - base[q])
    if regress or improve:
        print(f"\nbiggest moves (|delta| >= 0.05 s, top {args.top} each way):")
        show_rows(regress[:args.top])
        show_rows(improve[:args.top])

    # Uniform-vs-concentrated drift readout (r20 verdict item 4): the
    # host-noise adjudications argue "drift spread proportionally over
    # code-untouched queries" — make that a statistic. Per-query ratios
    # over queries big enough to measure (base >= 0.05 s); a HOST-HEAT
    # drift moves the median with a tight IQR and no large-delta outliers,
    # a CODE regression concentrates in a few queries far outside the IQR.
    ratios = sorted((head[q] / base[q], q) for q in carried
                    if base[q] >= 0.05)
    if len(ratios) >= 8:
        def pct(p):
            i = p * (len(ratios) - 1)
            lo, hi = int(i), min(int(i) + 1, len(ratios) - 1)
            return ratios[lo][0] + (i - lo) * (ratios[hi][0] - ratios[lo][0])
        q1, med, q3 = pct(0.25), pct(0.50), pct(0.75)
        iqr = q3 - q1
        fence = q3 + 3.0 * iqr
        outliers = [(r, q) for r, q in ratios
                    if r > fence and head[q] - base[q] >= 0.2]
        shape = ("CONCENTRATED (investigate the outliers below)" if outliers
                 else ("UNIFORM (host-level; no per-query outlier)"
                       if abs(med - 1.0) > 0.02
                       else "FLAT (median within 2% of 1.0)"))
        print(f"\ndrift readout over {len(ratios)} queries with base >= "
              f"0.05 s:\n  median ratio {med:.3f}, IQR [{q1:.3f}, {q3:.3f}]"
              f", outlier fence {fence:.3f} -> {shape}")
        for r, q in sorted(outliers, reverse=True)[:args.top]:
            print(f"  outlier {q}: {base[q]:.2f} -> {head[q]:.2f} ({r:.2f}x)")

    violations = [q for q in carried
                  if head[q] > args.threshold_ratio * base[q]
                  and head[q] > args.floor_sec]
    if violations or head_failed:
        print(f"\nVIOLATIONS (> {args.threshold_ratio}x past "
              f"{args.floor_sec} s, or failed head samples):")
        for q in violations:
            ratio = (f"{head[q] / base[q]:.2f}x" if base[q] > 0
                     else "base 0.00")
            print(f"  {q}: {base[q]:.2f} -> {head[q]:.2f} ({ratio})")
        for q in sorted(head_failed):
            print(f"  {q}: FAILED in a head run")
        sys.exit(1)
    print("\nno violations")
    sys.exit(0)


if __name__ == "__main__":
    main()
