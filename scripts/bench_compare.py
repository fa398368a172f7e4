#!/usr/bin/env python3
"""Compare two BENCH_LOCAL artifacts under the r19 weather protocol.

Usage: bench_compare.py OLD.json NEW.json [topN]

Per-query cpu_s is divided by each artifact's own normalizer mean
(norm_cpu_s_start/end — the fixed state-free shuffle Bench times at
start and end) before comparing, so a hot box cancels out instead of
reading as a plan regression (PLANS §r19: absolute cpu comparisons
across sessions are void; r18's +15.5% "regression" was weather).
Artifacts older than r19 carry no normalizer — the script then falls
back to raw cpu and SAYS SO, because that comparison is weak evidence.

Output: both normalizers, total cpu raw + normalized, and the topN
queries by |normalized ratio change|, flagged when the normalized
delta exceeds 25% AND the raw delta exceeds 0.3 cpu_s (under either
bar the delta is indistinguishable from per-query gust noise at this
box's measured minute-scale variance).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    norm = None
    if "norm_cpu_s_start" in d and "norm_cpu_s_end" in d:
        norm = (float(d["norm_cpu_s_start"]) +
                float(d["norm_cpu_s_end"])) / 2.0
    cpu = {k: v for k, v in d.get("cpu_s", {}).items() if v >= 0}
    return d, cpu, norm


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    od, ocpu, onorm = load(old_path)
    nd, ncpu, nnorm = load(new_path)

    normalized = onorm is not None and nnorm is not None
    if not normalized:
        print("WARNING: normalizer missing in "
              + ", ".join(p for p, n in [(old_path, onorm),
                                         (new_path, nnorm)] if n is None)
              + " — falling back to RAW cpu (weak evidence: host "
                "weather is not cancelled)")
    onorm = onorm if normalized else 1.0
    nnorm = nnorm if normalized else 1.0
    unit = "cpu/norm" if normalized else "raw cpu_s"

    print(f"old: {old_path}  norm={onorm:.3f}  "
          f"total_cpu={od.get('total_cpu_s')}  n={len(ocpu)}")
    print(f"new: {new_path}  norm={nnorm:.3f}  "
          f"total_cpu={nd.get('total_cpu_s')}  n={len(ncpu)}")
    shared = sorted(set(ocpu) & set(ncpu))
    only_old = sorted(set(ocpu) - set(ncpu))
    only_new = sorted(set(ncpu) - set(ocpu))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"new queries ({len(only_new)}): " + ", ".join(
            f"{q} ({ncpu[q]:.2f} cpu_s)" for q in only_new))

    tot_o = sum(ocpu[q] for q in shared) / onorm
    tot_n = sum(ncpu[q] for q in shared) / nnorm
    print(f"shared-query total ({unit}): {tot_o:.3f} -> {tot_n:.3f} "
          f"({tot_n / tot_o - 1:+.1%} vs old)" if tot_o
          else "no shared queries")

    rows = []
    for q in shared:
        ro, rn = ocpu[q] / onorm, ncpu[q] / nnorm
        if ro <= 0:
            continue
        rows.append((abs(rn / ro - 1), q, ro, rn,
                     ncpu[q] - ocpu[q]))
    rows.sort(reverse=True)

    def flagged(row):
        chg, _, _, _, rawd = row
        return chg > 0.25 and abs(rawd) > 0.3

    # every flagged row prints, even past topN: the flag requires the
    # raw-delta bar the |ratio| sort key ignores, so a small topN could
    # otherwise count a query as flagged yet never show it
    shown = rows[:top_n] + [r for r in rows[top_n:] if flagged(r)]
    print(f"\ntop {top_n} by |normalized ratio change|, plus every "
          f"flagged row (FLAG = >25% normalized AND >0.3 raw cpu_s):")
    for row in shown:
        chg, q, ro, rn, rawd = row
        flag = "FLAG" if flagged(row) else "    "
        print(f"  {flag} {q:42s} {ro:8.4f} -> {rn:8.4f} "
              f"({rn / ro - 1:+.1%}; raw {rawd:+.2f} cpu_s)")
    flags = [r[1] for r in rows if flagged(r)]
    print(f"\nflagged: {len(flags)}"
          + (f" — {', '.join(flags)}" if flags else ""))


if __name__ == "__main__":
    main()
