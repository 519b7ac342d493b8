#!/usr/bin/env python3
"""Summarize a multi-run bench band file (lines from graft.Bench runs).

Usage: python3 tools/band_summary.py target/band_r10.txt [PRIOR]

PRIOR may be:
  - a raw band file (lines with {"metric":"queries",...}),
  - a bench_detail.json written by graft.Bench (full per-query detail),
  - a driver BENCH_rN.json wrapper (its 'tail' holds a TRUNCATED escaped
    fragment of the detail line — pairs are recovered by regex and the
    summary says how many, so "no regressions" can't be silently read
    from an empty comparison).

Prints per-query min/median/max across the runs, the calib triple, and —
when a prior is given — the queries whose median moved more than 30% vs
that prior's detail.
"""
import json
import re
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
            if "total" in runs[-1]:
                # ADVICE r9: a run whose queries line was lost (truncation)
                # must NOT have its total pasted onto the PREVIOUS run's
                # detail — drop the orphan total instead of mispairing.
                print(f"[band_summary] WARNING: orphan total line dropped "
                      f"(its queries line was missing): total={t['value']}",
                      file=sys.stderr)
                continue
            runs[-1].update(total=t["value"], calib=t["calib_sec"],
                            calib_shuffle=t["calib_shuffle_sec"],
                            calib_io=t.get("calib_io_sec", -1.0),
                            streaming=t["streaming_sec"],
                            analytic=t["analytic_sec"],
                            failed=t["failed"], n=t["n_queries"])
    # drop runs whose total line never arrived (crashed/truncated run)
    return [r for r in runs if "total" in r]


def load_prior(path):
    """Return (detail_dict, source_note) or (None, reason).

    Driver-wrapper tails need care: the capture keeps the LAST ~2000
    chars of stdout, so the first line of the tail is usually a headless
    FRAGMENT of whichever metric line got cut — and when that line is
    queries_normalized, its values are raw/host_factor (review r10: the
    old regex-over-everything recovery silently compared normalized prior
    values against raw current medians, skewing every ratio by the prior
    run's host factor). Fragments are attributed by looking at the next
    complete line's metric and de-normalized via the parsed host_factor
    when needed.
    """
    text = open(path).read()
    # Case 1: whole-file JSON (bench_detail.json or driver wrapper).
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict):
        if isinstance(doc.get("detail"), dict):        # bench_detail.json
            return doc["detail"], f"bench_detail ({len(doc['detail'])} queries)"
        if "tail" in doc:                              # driver BENCH_rN wrapper
            host = None
            if isinstance(doc.get("parsed"), dict):
                host = doc["parsed"].get("host_factor")
            lines = [ln.strip() for ln in doc["tail"].splitlines() if ln.strip()]
            parsed_lines = []
            for ln in lines:
                if ln.startswith("{"):
                    try:
                        parsed_lines.append(json.loads(ln))
                        continue
                    except json.JSONDecodeError:
                        pass
                parsed_lines.append(ln)  # headless fragment (or broken json)
            # best case: a COMPLETE raw queries line survived
            for d2 in parsed_lines:
                if isinstance(d2, dict) and d2.get("metric") == "queries":
                    det = d2["detail"]
                    return det, f"driver wrapper (full queries line, {len(det)} queries)"
            # next: a complete normalized line -> de-normalize
            for d2 in parsed_lines:
                if isinstance(d2, dict) and d2.get("metric") == "queries_normalized":
                    h = float(d2.get("host_factor") or host or 0)
                    if h > 0:
                        det = {k: v * h for k, v in d2["detail"].items() if v >= 0}
                        return det, (f"driver wrapper (normalized line x "
                                     f"host_factor {h:.3f}, {len(det)} queries)")
            # last resort: the headless first fragment, attributed by the
            # metric of the next complete line
            for i, frag in enumerate(parsed_lines):
                if isinstance(frag, str):
                    pairs = dict((k, float(v)) for k, v in
                                 re.findall(r'"([A-Za-z0-9_]+)":(-?\d+\.\d+)', frag))
                    # ADVICE r10: a tail cut INSIDE the stream_commit line
                    # yields trigger_sec/commit_sec pairs that are NOT
                    # per-query seconds — de-normalizing and "recovering"
                    # them silently compares nothing. Reject fragments
                    # carrying stream-split field names, and only accept a
                    # fragment as a normalized-line tail when the next
                    # complete line is the one that FOLLOWS
                    # queries_normalized in the emit order (stream_commit);
                    # a fragment followed directly by "total" was cut
                    # inside stream_commit itself.
                    split_fields = {"batches", "trigger_sec", "commit_sec",
                                    "wal_sec", "state_sec", "work_sec"}
                    if not pairs or split_fields & pairs.keys():
                        continue
                    nxt = next((d2.get("metric") for d2 in parsed_lines[i + 1:]
                                if isinstance(d2, dict)), None)
                    if nxt == "queries_normalized":
                        return pairs, (f"driver wrapper tail - TRUNCATED raw "
                                       f"queries fragment, only {len(pairs)} "
                                       f"queries recovered; moves in the lost "
                                       f"head are NOT checked")
                    if nxt != "stream_commit":
                        continue  # cut inside stream_commit/total: unusable
                    # fragment belongs to queries_normalized
                    if host and host > 0:
                        pairs = {k: v * float(host) for k, v in pairs.items()}
                        return pairs, (f"driver wrapper tail - TRUNCATED "
                                       f"NORMALIZED fragment de-normalized by "
                                       f"host_factor {host:.3f}, only "
                                       f"{len(pairs)} queries recovered; moves "
                                       f"in the lost head are NOT checked")
                    return None, ("normalized fragment with no host_factor to "
                                  "de-normalize - refusing a skewed comparison")
            return None, "driver wrapper had no recoverable query pairs in tail"
    # Case 2: raw band file - first queries line.
    for line in text.splitlines():
        if '"metric":"queries"' in line and 'normalized' not in line:
            try:
                return json.loads(line)["detail"], "raw band line"
            except (json.JSONDecodeError, KeyError):
                pass
    return None, "no queries detail found in file"


def main():
    runs = load_runs(sys.argv[1])
    prior, prior_note = (None, None)
    if len(sys.argv) > 2:
        prior, prior_note = load_prior(sys.argv[2])
        if prior is None:
            # ADVICE r9: an unloadable prior must be LOUD — a silent skip
            # reads as "no regressions" when nothing was compared.
            print(f"[band_summary] ERROR: prior {sys.argv[2]} unusable: "
                  f"{prior_note}; the >30%-move check DID NOT RUN",
                  file=sys.stderr)
    print(f"runs: {len(runs)}")
    for i, r in enumerate(runs, 1):
        print(f"  run{i}: total={r['total']:.1f}s streaming={r['streaming']:.1f} "
              f"analytic={r['analytic']:.1f} calib={r['calib']:.3f}/"
              f"{r['calib_shuffle']:.3f}/{r['calib_io']:.3f} "
              f"failed={r['failed']}/{r['n']}")
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
        print(f"\nvs prior [{prior_note}] (>30% median move, >0.2s absolute):")
        moves = 0
        for k in keys:
            if k in prior and prior[k] > 0 and med[k] > 0:
                ratio = med[k] / prior[k]
                if (ratio > 1.3 or ratio < 0.7) and abs(med[k] - prior[k]) > 0.2:
                    print(f"  {k}: {prior[k]:.2f} -> {med[k]:.2f} ({ratio:.2f}x)")
                    moves += 1
        if moves == 0:
            print("  (none)")
        uncovered = [k for k in keys if k not in prior]
        if uncovered:
            print(f"  not in prior detail ({len(uncovered)}): "
                  + ", ".join(uncovered[:10])
                  + (" ..." if len(uncovered) > 10 else ""))


if __name__ == "__main__":
    main()
