#!/usr/bin/env python3
"""Scaling-exponent report: compare two graft.Bench records at different
scale factors and emit a markdown table of per-query time ratios.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> <data_ratio>

data_ratio is the row-count multiplier between the two runs (10 for
sf0.1 -> sf1). For each query: ratio = t_big / t_small and the implied
exponent p where t ~ n^p (p = log(ratio) / log(data_ratio)). Queries
faster than the noise floor (0.2 s) in the SMALL run get "~" exponents:
their small-run time is dominated by fixed per-query overhead (plan
compile, session round-trip), so the ratio understates nothing but the
exponent is not meaningful below the floor.

Output: markdown to stdout, sorted by ratio descending, with a SUPER
flag on ratio > data_ratio * 1.5 (super-linear beyond noise) for
queries >= 1 s at the big SF.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"], d.get("sf", "?")


def main():
    small_path, big_path, data_ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    if data_ratio <= 1:
        sys.exit("usage error: data_ratio must be > 1 (log-ratio exponent)")
    small, sf_s = load(small_path)
    big, sf_b = load(big_path)
    common = sorted(set(small) & set(big))
    if not common:
        sys.exit("usage error: the two runs share no query names")
    missing = sorted(set(small) ^ set(big))
    rows = []
    for q in common:
        ts, tb = small[q], big[q]
        # a non-positive small-run time carries no scaling signal —
        # report the big time with a "~" exponent instead of inf/NaN
        noisy = ts < 0.2
        ratio = tb / ts if ts > 0 else float("nan")
        exp = (math.log(ratio) / math.log(data_ratio)
               if ts > 0 and ratio > 0 else 0.0)
        superlin = ts > 0 and ratio > data_ratio * 1.5 and tb >= 1.0
        rows.append((ratio, q, ts, tb, exp, noisy or ts <= 0, superlin))
    rows.sort(key=lambda r: (r[0] if r[0] == r[0] else -1.0), reverse=True)
    print(f"| query | {sf_s} (s) | {sf_b} (s) | ratio | exponent | flag |")
    print("|---|---|---|---|---|---|")
    for ratio, q, ts, tb, exp, noisy, superlin in rows:
        e = f"~{exp:.2f}" if noisy else f"{exp:.2f}"
        flag = "SUPER" if superlin else ""
        # ratio is NaN when the small-SF time is <= 0 (ADVICE r10: the
        # f-format would print a literal "nanx")
        r = f"{ratio:.1f}x" if ratio == ratio else "-"
        print(f"| {q} | {ts:.3f} | {tb:.3f} | {r} | {e} | {flag} |")
    tot_s = sum(small[q] for q in common)
    tot_b = sum(big[q] for q in common)
    tot_ratio = f"{tot_b / tot_s:.1f}x" if tot_s > 0 else "n/a"
    print(f"\ntotal: {tot_s:.1f} s -> {tot_b:.1f} s "
          f"({tot_ratio} at {data_ratio:.0f}x data); "
          f"{sum(1 for r in rows if r[6])} super-linear >= 1 s")
    if missing:
        print(f"not in both runs: {', '.join(missing)}")


if __name__ == "__main__":
    main()
