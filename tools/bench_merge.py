#!/usr/bin/env python3
"""Merge N raw Bench JSON lines (one per pass) into the bench/ artifact
shape: summary = per-query min across passes, value = sum of mins."""
import json, sys

out, raws = sys.argv[1], sys.argv[2:]
passes = []
for p in raws:
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("[info] "):
                line = line[len("[info] "):]
            if line.startswith("{") and '"metric"' in line:
                passes.append(json.loads(line))
                break
assert passes, "no bench JSON lines found"
qs = passes[0]["queries"].keys()
mins = {q: min(p["queries"][q] for p in passes) for q in qs}
summary = dict(passes[0])
summary["queries"] = mins
summary["value"] = sum(mins.values())
with open(out, "w") as f:
    json.dump({"summary": summary, "passes": [p["queries"] for p in passes]}, f)
print(f"{out}: {len(mins)} queries, total {summary['value']:.1f}s over {len(passes)} passes")
