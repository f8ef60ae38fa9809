#!/usr/bin/env python3
"""Round-over-round bench comparison with host-speed normalization.

Usage:
    python3 tools/bench_compare.py OLD.json NEW.json [--top N]

Both inputs are bench_detail.json artifacts (or BENCH_r*.json headline
lines). The comparison the judge previously had to reconstruct by hand:

- host multiplier  = new.calib / old.calib (per-pass `calibs` arrays
  shown when present — a contended pass shows up as one inflated stamp)
- carried-query ratio median: the robust "did the engine get slower"
  signal (insensitive to a few genuinely changed plans)
- per-query normalized ratios (new / old / multiplier), top movers both
  directions, plus added/removed query keys

A ratio table is only as honest as its denominator: queries whose raw
time is below `--floor` (default 0.15 s) in BOTH rounds are excluded
from the median — scheduling noise dominates them.
"""
import argparse
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # tolerate sbt-prefixed headline lines
    start = txt.find("{")
    return json.loads(txt[start:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--floor", type=float, default=0.15)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    mult = None
    if old.get("calib") and new.get("calib"):
        mult = new["calib"] / old["calib"]
        print(f"host multiplier (new.calib/old.calib): {mult:.3f}")
    for tag, d in (("old", old), ("new", new)):
        if d.get("calibs"):
            cs = d["calibs"]
            spread = max(cs) / min(cs) if min(cs) > 0 else float("nan")
            print(f"{tag} per-pass calibs: {cs}  (spread {spread:.2f}x"
                  + ("; contended pass(es) present" if spread > 1.5 else "") + ")")

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    carried = sorted(set(nq) & set(oq))
    rows = []
    for k in carried:
        o, n = oq[k], nq[k]
        if o <= 0 or n <= 0:
            continue
        raw = n / o
        norm = raw / mult if mult else raw
        rows.append((k, o, n, raw, norm))

    meaningful = [r for r in rows if max(r[1], r[2]) >= args.floor]
    if meaningful:
        med = statistics.median(r[4] for r in meaningful)
        print(f"carried-query normalized-ratio median: {med:.3f} "
              f"({len(meaningful)} of {len(rows)} carried queries above "
              f"{args.floor}s floor)")
        print(f"  > 1.0 = slower than last round after host normalization")

    def show(title, rs):
        print(f"\n{title}")
        print(f"  {'query':32s} {'old':>7s} {'new':>7s} {'raw':>6s} {'norm':>6s}")
        for k, o, n, raw, norm in rs:
            print(f"  {k:32s} {o:7.3f} {n:7.3f} {raw:6.2f} {norm:6.2f}")

    by_norm = sorted(meaningful, key=lambda r: -r[4])
    show(f"top {args.top} regressions (normalized)", by_norm[: args.top])
    show(f"top {args.top} improvements (normalized)",
         sorted(meaningful, key=lambda r: r[4])[: args.top])

    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    norm_note = f" ({tot_n / tot_o / mult:.3f} normalized)" if mult else ""
    print(f"\ncarried-set totals: old {tot_o:.1f}s -> new {tot_n:.1f}s "
          f"= {tot_n / tot_o:.3f} raw{norm_note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
