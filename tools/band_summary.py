#!/usr/bin/env python3
"""Summarize a multi-run bench band file (lines from graft.Bench runs).

Usage: python3 tools/band_summary.py target/band_r9.txt [BENCH_r08.json]

Prints per-query min/median/max across the runs, the calib pairs, and —
when a prior BENCH_rN.json is given — the queries whose median moved
more than 30% vs that round's detail.
"""
import json
import statistics
import sys


def load_runs(path):
    runs = []
    for line in open(path):
        line = line.strip()
        if '"metric":"queries"' in line and '"queries_normalized"' not in line:
            d = json.loads(line)
            if d.get("metric") == "queries":
                runs.append({"detail": d["detail"]})
        elif '"metric":"total"' in line:
            t = json.loads(line)
            if not runs:
                continue  # truncated band file: total line without queries
            runs[-1].update(total=t["value"], calib=t["calib_sec"],
                            calib_shuffle=t["calib_shuffle_sec"],
                            streaming=t["streaming_sec"],
                            analytic=t["analytic_sec"],
                            failed=t["failed"], n=t["n_queries"])
    # drop runs whose total line never arrived (crashed/truncated run)
    return [r for r in runs if "total" in r]


def main():
    runs = load_runs(sys.argv[1])
    prior = None
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            for line in f:
                if '"metric":"queries"' in line and 'normalized' not in line:
                    prior = json.loads(line)["detail"]
                    break
    print(f"runs: {len(runs)}")
    for i, r in enumerate(runs, 1):
        print(f"  run{i}: total={r['total']:.1f}s streaming={r['streaming']:.1f} "
              f"analytic={r['analytic']:.1f} calib={r['calib']:.3f}/"
              f"{r['calib_shuffle']:.3f} failed={r['failed']}/{r['n']}")
    # union of keys across runs: a mid-band binary change can add/remove
    # queries, and runs[0] alone would silently drop the additions
    keys = sorted({k for r in runs for k in r["detail"]})
    med = {}
    print("\nper-query median (top 25 by median):")
    for k in keys:
        vals = [r["detail"][k] for r in runs if r["detail"].get(k, -1) >= 0]
        med[k] = statistics.median(vals) if vals else -1
    for k in sorted(med, key=med.get, reverse=True)[:25]:
        vals = [r["detail"].get(k, -1) for r in runs]
        print(f"  {k}: med={med[k]:.2f} runs={['%.2f' % v for v in vals]}")
    good = {k: v for k, v in med.items() if v >= 0}
    tot_med = sum(good.values())
    n_failed = len(keys) - len(good)
    print(f"\nsum of per-query medians: {tot_med:.1f}s over {len(good)} queries "
          f"= {tot_med / max(1, len(good)):.3f} s/query"
          + (f" ({n_failed} queries failed in all runs, excluded)" if n_failed else ""))
    if prior:
        print("\nvs prior run detail (>30% median move, >0.2s absolute):")
        for k in keys:
            if k in prior and prior[k] > 0 and med[k] > 0:
                ratio = med[k] / prior[k]
                if (ratio > 1.3 or ratio < 0.7) and abs(med[k] - prior[k]) > 0.2:
                    print(f"  {k}: {prior[k]:.2f} -> {med[k]:.2f} ({ratio:.2f}x)")
        new = [k for k in keys if k not in prior]
        if new:
            print(f"  new queries: {new}")


if __name__ == "__main__":
    main()
