#!/usr/bin/env python3
"""Regenerate the SCALING.md sweep tables from three bench_out.json
dumps (one per scale factor). Usage:

    python3 tools/scaling_report.py sf0.001.json sf0.01.json sf0.1.json

Prints the markdown table bodies; the narrative stays hand-written.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    # error entries are {"err": ...} with no "s" — skip them or any
    # sweep that had a failing query crashes the regeneration
    qs = {k: v["s"] for k, v in d["queries"].items() if "s" in v}
    return d, qs


def main():
    (d1, a), (d2, b), (d3, c) = (load(p) for p in sys.argv[1:4])
    print(f"| sf | total wall | errors | queries |")
    print(f"|---|---|---|---|")
    for d in (d1, d2, d3):
        print(f"| {d['sf'].split('sf')[-1]} | {d['value']:.1f} s "
              f"| {d['errors']} | {len(d['queries'])} |")
    common = sorted(set(a) & set(c))
    ratios = []
    for q in common:
        if a[q] >= 0.2:
            ratios.append((c[q] / a[q], q))
    ratios.sort(reverse=True)
    med = sorted(r for r, _ in ratios)[len(ratios) // 2]
    print(f"\nmedian per-query sf0.001->sf0.1 ratio (baseline >= 0.2 s): "
          f"{med:.2f}x over {len(ratios)} queries")
    print(f"suite total ratio: {d3['value'] / d1['value']:.2f}x")
    print("\n| query | sf0.001 | sf0.01 | sf0.1 | ratio 100x |")
    print("|---|---|---|---|---|")
    for r, q in ratios[:18]:
        print(f"| {q} | {a[q]:.2f} s | {b.get(q, float('nan')):.2f} s "
              f"| {c[q]:.2f} s | {r:.1f}x |")
    # anything outright slow at sf0.1
    slow = sorted(((c[q], q) for q in c), reverse=True)[:10]
    print("\nslowest at sf0.1:")
    for s, q in slow:
        print(f"  {q}: {s:.2f} s")
    # noise adjudication from the sf0.1 report's own requiesced pass:
    # a suite reading that a quiesced end-of-sweep re-measure undercuts
    # by >40% (with bytes unchanged by construction) is ambient wake,
    # not a regression — do NOT burn an investigation on it
    phantoms = [(k, v["s"], v["requiesced_s"])
                for k, v in d3["queries"].items()
                if v.get("requiesced_s") and v["requiesced_s"] < 0.6 * v["s"]]
    if phantoms:
        print("\nadjudicated-ambient at sf0.1 (requiesced << suite):")
        for k, s, r in sorted(phantoms, key=lambda t: -t[1]):
            print(f"  {k}: {s:.2f} s suite -> {r:.2f} s quiesced")


if __name__ == "__main__":
    main()
