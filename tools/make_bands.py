#!/usr/bin/env python3
"""Regenerate the clean-band resource consumed by Bench's repeat-on-spike
policy from a band file of concatenated graft.Bench stdout lines
(>= 2 full runs recorded on a clean host).

Usage: python3 tools/make_bands.py target/bands/band_r13.txt

Writes src/main/resources/graft/bench_bands.json with the per-query
MEDIAN across the runs (plain positive decimals only — failed rows (-1)
are dropped; a query missing from every run simply has no band, which the
policy treats as "never re-run", fail-safe toward measuring).
"""
import json
import statistics
import sys

OUT = "src/main/resources/graft/bench_bands.json"


def main(path):
    runs = []
    for line in open(path):
        line = line.strip()
        if '"metric":"queries"' in line and "queries_normalized" not in line:
            d = json.loads(line)
            if d.get("metric") == "queries":
                runs.append(d["detail"])
    if len(runs) < 2:
        sys.exit(f"need >= 2 runs in {path}, found {len(runs)}")
    keys = sorted(set().union(*[set(r) for r in runs]))
    bands = {}
    for k in keys:
        vals = [r[k] for r in runs if k in r and r[k] >= 0]
        if vals:
            bands[k] = round(statistics.median(vals), 3)
    with open(OUT, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f'"{k}": {v}' for k, v in sorted(bands.items())))
        f.write("\n}\n")
    print(f"wrote {OUT}: {len(bands)} bands from {len(runs)} runs")


if __name__ == "__main__":
    main(sys.argv[1])
