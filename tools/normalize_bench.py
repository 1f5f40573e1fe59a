#!/usr/bin/env python3
"""Calibration-normalized comparison of two bench artifacts.

Usage: python3 tools/normalize_bench.py <old_detail.json> <new_detail.json>

The bench box is a shared host whose effective CPU speed was measured to
swing >1.6x within an hour (SCALE.md, round-8 bisect) — raw wall-second
deltas across runs mostly measure the box, not the code. Every Bench
artifact carries deterministic CPU probes at phase boundaries:
`calib_sec` (single-thread xorshift) and, from round 9, `calib_par_sec`
(the same loop on one thread per core, wall time until all finish).
Round 8 proved the SCALAR probe under-corrects a 32-way workload by up
to ~10x when the shared host's parallel throughput collapses, so this
script PREFERS the parallel probe when both artifacts carry one and
says which probe it used. It divides per-query times by each run's mean
probe time before comparing, so what remains is (approximately) work
per CPU-throughput unit. Artifacts without any probe (pre-round-8) fall
back to a probe of 1.0 and the output says so.

Output: normalized totals over the common query set, the median ratio,
and the queries whose NORMALIZED ratio exceeds 1.3x either way.
"""
import json
import statistics
import sys


def mean_probe(cal, ran_main_extra=False):
    # The `queries` map holds MAIN-phase times, so when the artifact has
    # per-phase points, normalize by the probes bracketing the main phase:
    # pre_main, every intra-main window probe (i<iter>_q<idx>, round 10+),
    # and pre_stress. When phase 5 folded main_extra iteration minima into
    # the same `queries` map, minima may come from the post-stress regime,
    # so the end probe joins the bracket (ADVICE r9). Legacy artifacts
    # fall back to the mean of all points.
    bracket = [cal.get("pre_main")]
    bracket += [v for k, v in cal.items()
                if k.startswith("i") and "_q" in k]
    bracket.append(cal.get("pre_stress"))
    if ran_main_extra:
        bracket.append(cal.get("end"))
    probes = [v for v in bracket if v]
    if not probes:
        probes = [v for v in cal.values() if v]
    return statistics.mean(probes) if probes else None


def load(path):
    d = json.load(open(path))
    ran_main_extra = "main_extra" in (d.get("phase_sec") or {})
    scalar = mean_probe(d.get("calib_sec") or {}, ran_main_extra)
    par = mean_probe(d.get("calib_par_sec") or {}, ran_main_extra)
    return d.get("queries", {}), scalar, par


def main():
    old_q, old_s, old_par = load(sys.argv[1])
    new_q, new_s, new_par = load(sys.argv[2])
    if old_par and new_par:
        old_p, new_p = old_par, new_par
        print("probe kind: parallel (calib_par_sec)")
    else:
        old_p, new_p = old_s, new_s
        print("probe kind: scalar (calib_sec) — no parallel probe in both")
    for name, p in (("old", old_p), ("new", new_p)):
        if p is None:
            print(f"WARN: {name} artifact has no calib probe — raw seconds")
    op, np_ = old_p or 1.0, new_p or 1.0
    common = sorted(set(old_q) & set(new_q))
    if not common:
        print("no common queries")
        return 1
    tot_old = sum(old_q[q] / op for q in common)
    tot_new = sum(new_q[q] / np_ for q in common)
    ratios = sorted(
        (new_q[q] / np_) / (old_q[q] / op) for q in common if old_q[q] > 0)
    print(f"probes: old={old_p} new={new_p}")
    print(f"common queries: {len(common)}")
    print(f"normalized totals: {tot_old:.1f} -> {tot_new:.1f} "
          f"({tot_new / tot_old:.2f}x), median ratio "
          f"{statistics.median(ratios):.2f}")
    flagged = [(q, (new_q[q] / np_) / (old_q[q] / op)) for q in common
               if old_q[q] > 0.2
               and not 1 / 1.3 < (new_q[q] / np_) / (old_q[q] / op) < 1.3]
    for q, r in sorted(flagged, key=lambda x: -x[1]):
        print(f"  {'SLOWER' if r > 1 else 'faster'} {r:5.2f}x {q} "
              f"({old_q[q]:.2f}s -> {new_q[q]:.2f}s raw)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
