#!/usr/bin/env python3
"""Regenerate SCALE.md's measured stress table from two min-of-N bench
detail files (VERDICT r6 #2: single-pass rows disagreed up to 2.3x
between same-code runs; the gate-worthy number is the min over
iterations, cross-checked across two full runs).

Usage: gen_scale_table.py run1_detail.json run2_detail.json

Prints the markdown table (query, x1, x16, ratio per run, cross-run
ratio drift) and a noise-bound summary line. Rows whose cross-run ratio
drift exceeds 1.3x are flagged — those rows are NOT gate-worthy and the
table says so explicitly instead of printing one lucky number.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    s = d["stress"]
    return s["base"], s["scaled"], s.get("iters", 1)


def main():
    b1, s1, it1 = load(sys.argv[1])
    b2, s2, it2 = load(sys.argv[2])
    names = sorted(set(b1) & set(s1) & set(b2) & set(s2))
    rows, drifts = [], []
    for n in names:
        r1 = s1[n] / b1[n] if b1[n] > 0 else float("nan")
        r2 = s2[n] / b2[n] if b2[n] > 0 else float("nan")
        drift = max(r1, r2) / min(r1, r2) if min(r1, r2) > 0 else float("inf")
        drifts.append(drift)
        # report the per-run MIN base/scaled (each already min-of-N inside
        # a run) and both ratios
        rows.append((n, min(b1[n], b2[n]), min(s1[n], s2[n]), r1, r2, drift))
    print("| query | x1 (s) | x16 (s) | ratio run1 | ratio run2 | drift |")
    print("|---|---|---|---|---|---|")
    for n, b, s, r1, r2, d in rows:
        flag = " **(noisy)**" if d > 1.3 else ""
        print(f"| {n} | {b:.2f} | {s:.2f} | {r1:.1f} | {r2:.1f} | "
              f"{d:.2f}x{flag} |")
    stable = sum(1 for d in drifts if d <= 1.3)
    print()
    print(f"min-of-{it1}/{it2} per run; {stable}/{len(rows)} rows stable "
          f"to <1.3x across the two runs; max drift "
          f"{max(drifts):.2f}x")


if __name__ == "__main__":
    main()
