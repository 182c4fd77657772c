#!/usr/bin/env python3
"""Median-of-N bench protocol (VERDICT r12 ask #1).

Reads N per-run bench JSON files (the `graft.Bench` one-line format),
emits:
  - a median-of-N headline JSON (per-key median; total = sum of medians)
  - a per-key variance band table (min / median / max / spread%)
  - optional comparison against a baseline JSON (BENCH_BASELINE_NEWDATA.json
    "queries" map) and against a previous-round run.

Usage:
  bench_stats.py runA.json runB.json runC.json \
      [--baseline BENCH_BASELINE_NEWDATA.json] [--prev BENCH_QUIETHOST_r12.json] \
      [--out-median /tmp/bench_median.json] [--out-band BENCH_BAND_r13.md]
"""
import json, sys, statistics, argparse


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # file may contain one JSON line; take the first parseable line
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{"):
            # a truncated run file or an interleaved log line that happens
            # to start with '{' must not crash the whole protocol — skip
            # to the next candidate line (ADVICE r13)
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in d:
                return d
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--baseline")
    ap.add_argument("--prev")
    ap.add_argument("--out-median")
    ap.add_argument("--out-band")
    a = ap.parse_args()

    runs = [load(p) for p in a.runs]
    keysets = [set(k for k, v in r["queries"].items() if v >= 0) for r in runs]
    shared = set.intersection(*keysets)
    allk = set.union(*keysets)
    med = {k: statistics.median([r["queries"][k] for r in runs if r["queries"].get(k, -1) >= 0])
           for k in allk}
    total_med = sum(med.values())
    per_run_totals = [sum(v for v in r["queries"].values() if v >= 0) for r in runs]

    # keys without a valid sample in EVERY run get a median of fewer
    # samples — name them loudly and annotate the committed JSON so the
    # headline can never silently launder a partial key (ADVICE r13)
    short = sorted(k for k in allk if k not in shared)

    print(f"runs: {len(runs)}  keys: {len(allk)} ({len(shared)} in all runs)")
    print("per-run totals: " + ", ".join(f"{t:.1f}s" for t in per_run_totals))
    print(f"median-of-{len(runs)} headline (sum of per-key medians): {total_med:.1f}s")
    if short:
        shared_total = sum(med[k] for k in shared)
        print(f"WARNING: {len(short)} key(s) have <{len(runs)} valid samples: "
              + ", ".join(short))
        print(f"shared-keyset headline ({len(shared)} keys): {shared_total:.1f}s")

    # variance band
    band = []
    for k in sorted(allk):
        vals = [r["queries"][k] for r in runs if r["queries"].get(k, -1) >= 0]
        lo, hi, m = min(vals), max(vals), statistics.median(vals)
        spread = (hi - lo) / m * 100 if m > 0 else 0.0
        band.append((k, lo, m, hi, spread))
    wide = [b for b in band if b[4] > 30 and b[3] - b[1] > 0.5]
    print(f"\nkeys with spread >30% AND >0.5s absolute ({len(wide)}):")
    for k, lo, m, hi, s in sorted(wide, key=lambda b: -(b[3] - b[1]))[:20]:
        print(f"  {k:36s} {lo:7.2f} / {m:7.2f} / {hi:7.2f}  ({s:.0f}%)")

    if a.baseline:
        base = load(a.baseline)["queries"]
        bk = [k for k in base if k in med and base[k] > 0]
        ratio = sum(med[k] for k in bk) / sum(base[k] for k in bk)
        print(f"\nbaseline: {len(bk)} shared keys, median-run ratio {ratio:.3f}x")
        over = [(k, med[k] / base[k], base[k], med[k]) for k in bk if med[k] / base[k] > 2.0]
        print(f"per-key >2x ({len(over)}):")
        for k, r, b, m in sorted(over, key=lambda t: -t[1]):
            print(f"  {k:36s} {b:6.2f}s -> {m:6.2f}s  ({r:.1f}x)")

    if a.prev:
        prev = load(a.prev)["queries"]
        pk = [k for k in prev if k in med and prev[k] > 0 and med[k] > 0]
        ratio = sum(med[k] for k in pk) / sum(prev[k] for k in pk)
        print(f"\nprev round: {len(pk)} shared keys, ratio {ratio:.3f}x")
        moved = [(k, med[k] - prev[k], prev[k], med[k]) for k in pk
                 if abs(med[k] - prev[k]) > 1.0]
        print(f"per-key moved >1s ({len(moved)}):")
        for k, d, p, m in sorted(moved, key=lambda t: t[1]):
            print(f"  {k:36s} {p:6.2f}s -> {m:6.2f}s  ({d:+.2f}s)")

    if a.out_median:
        out = dict(runs[0])
        out["queries"] = {k: round(v, 3) for k, v in sorted(med.items())}
        out["value"] = round(total_med, 3)
        out["protocol"] = f"median-of-{len(runs)} per-key; totals {['%.1f' % t for t in per_run_totals]}"
        if short:
            out["partial_keys"] = {
                k: sum(1 for r in runs if r["queries"].get(k, -1) >= 0)
                for k in short}
        with open(a.out_median, "w") as f:
            json.dump(out, f)
        print(f"\nwrote {a.out_median}")

    if a.out_band:
        with open(a.out_band, "w") as f:
            f.write(f"# Per-key variance band — {len(runs)} quiet runs\n\n")
            f.write("| key | min | median | max | spread% |\n|---|---|---|---|---|\n")
            for k, lo, m, hi, s in band:
                f.write(f"| {k} | {lo:.2f} | {m:.2f} | {hi:.2f} | {s:.0f} |\n")
        print(f"wrote {a.out_band}")


if __name__ == "__main__":
    main()
