#!/usr/bin/env python3
"""Regenerate the clean-band resources consumed by Bench's repeat-on-spike
policy and its stream-phase adjudication from a band file of concatenated
graft.Bench stdout lines (>= 2 full runs recorded on a clean host).

Usage: python3 tools/make_bands.py target/bands/band_r13.txt [--phases-only]

Writes:
  src/main/resources/graft/bench_bands.json          per-query MEDIAN secs
  src/main/resources/graft/bench_stream_phases.json  per-stream-op phase
                                                     medians (work/wal/state
                                                     per-run seconds)

The phase file (generated round 17, closing VERDICT r15 queue #4) is what
lets a degraded capture separate "io tax on WAL/state commits" from "work
regression" mechanically: Bench.scala loads it and compares each stream
op's per-run work_sec and wal_sec+state_sec against these medians,
emitting work_ratio / io_ratio / phase_verdict per op on the
stream_commit line (rule documented in BASELINE.md round 17).

Plain positive decimals only — failed rows (-1) are dropped; a query
missing from every run simply has no band, which the policies treat as
"never re-run / no verdict", fail-safe toward measuring.

--phases-only: update ONLY the stream-phase resource (bands for query
wall-clock stay untouched — use when the capture host is clean enough for
phase ratios but the query bands were recorded on better evidence).

Both inputs are validated BEFORE either output is written (ADVICE r16):
default mode with <2 query runs exits with nothing written; default mode
with <2 stream_commit lines (a pre-round-15 band file) writes the query
bands and warns-and-skips the phase file; only --phases-only hard-exits
on missing stream_commit lines.
"""
import json
import statistics
import sys

OUT = "src/main/resources/graft/bench_bands.json"
OUT_PHASES = "src/main/resources/graft/bench_stream_phases.json"


def main(path, phases_only=False):
    runs = []
    phase_runs = []
    for line in open(path):
        line = line.strip()
        if '"metric":"queries"' in line and "queries_normalized" not in line:
            d = json.loads(line)
            if d.get("metric") == "queries":
                runs.append(d["detail"])
        elif '"metric":"stream_commit"' in line:
            d = json.loads(line)
            if d.get("metric") == "stream_commit":
                phase_runs.append(d["detail"])
    # Validate BOTH inputs before writing EITHER output (ADVICE r16): the
    # old order sys.exited on a short phase input after the band file was
    # already overwritten — a nonzero exit with a partial write.
    if len(runs) < 2 and not phases_only:
        sys.exit(f"need >= 2 runs in {path}, found {len(runs)}")
    skip_phases = False
    if len(phase_runs) < 2:
        if phases_only:
            sys.exit(f"need >= 2 stream_commit lines in {path}, found {len(phase_runs)}")
        # pre-round-15 band files carry no stream_commit lines — still a
        # valid source for query bands, so warn and skip the phase file
        print(f"WARNING: only {len(phase_runs)} stream_commit lines in {path} "
              f"(need 2) — phase resource NOT updated", file=sys.stderr)
        skip_phases = True

    if not phases_only:
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

    if skip_phases:
        return
    ops = sorted(set().union(*[set(r) for r in phase_runs]))
    phases = {}
    for op in ops:
        rows = [r[op] for r in phase_runs if op in r]
        med = {}
        for field in ("work_sec", "wal_sec", "state_sec"):
            vals = [row[field] for row in rows if field in row and row[field] >= 0]
            if vals:
                med[field] = round(statistics.median(vals), 3)
        if med:
            phases[op] = med
    with open(OUT_PHASES, "w") as f:
        json.dump(phases, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT_PHASES}: {len(phases)} ops from {len(phase_runs)} runs")


if __name__ == "__main__":
    main(sys.argv[1], phases_only="--phases-only" in sys.argv[2:])
