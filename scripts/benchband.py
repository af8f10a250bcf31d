#!/usr/bin/env python3
"""Assemble BENCH_BAND.json from N Bench runs (development tooling).

Usage: python3 scripts/benchband.py run1.json run2.json ... [--note "..."]

Each input is one line of graft.Bench stdout (the {"metric":...} JSON).
Writes BENCH_BAND.json (runs, min/median/max, per-query medians) and
/tmp/bench_median.json (a Bench-shaped file whose "queries" are the
per-query medians — feed it to scripts/headtohead.py so the Spark side
uses medians rather than a single run).
"""
import json
import statistics
import sys

args = sys.argv[1:]
note = ""
if "--note" in args:
    i = args.index("--note")
    if i + 1 >= len(args):
        sys.exit("--note requires a value")
    note = args[i + 1]
    args = args[:i] + args[i + 2:]
paths = [a for a in args if not a.startswith("--")]

runs = []
for p in paths:
    with open(p) as f:
        txt = f.read()
    start = txt.index('{"metric"')
    runs.append(json.loads(txt[start:txt.index("\n", start) if "\n" in txt[start:] else len(txt)]))

totals = [r["value"] for r in runs]
names = sorted(set().union(*[r["queries"].keys() for r in runs]))
med = {}
for q in names:
    vals = [r["queries"][q] for r in runs if r["queries"].get(q, -1) >= 0]
    if vals:
        med[q] = round(statistics.median(vals), 3)

band = {
    "metric": "total_per_query_sum",
    "unit": "sec",
    "sf": runs[0]["sf"],
    "n_runs": len(runs),
    "runs": [round(t, 3) for t in totals],
    "min": round(min(totals), 3),
    "median": round(statistics.median(totals), 3),
    "max": round(max(totals), 3),
    "note": note,
    "queries_median": med,
}
with open("BENCH_BAND.json", "w") as f:
    json.dump(band, f, indent=1, sort_keys=False)
with open("/tmp/bench_median.json", "w") as f:
    json.dump({"metric": "total", "value": band["median"], "unit": "sec",
               "sf": band["sf"], "queries": med}, f)
print(f"{len(runs)} runs  min={band['min']}  median={band['median']}  "
      f"max={band['max']}  ({len(med)} queries)")
