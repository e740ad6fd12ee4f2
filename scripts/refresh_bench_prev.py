#!/usr/bin/env python3
"""Refresh bench_prev.json (graft.Bench's drift-triage reference) from
target/bench.json — run at the START of a round, when target/bench.json
still holds the previous round's DRIVER record (the driver's own Bench
run persists its full per-query line there; see Bench.scala).

Refuses to overwrite with a subset run (SPARK_GRAFT_ONLY leaves too few
keys to be a triage baseline) or an unparsable file, so an accidental
mid-round invocation cannot destroy the reference — exactly the mistake
that cost round 12 the exact r11 record (a 10-query smoke run clobbered
target/bench.json before it was copied; the seed had to be reconstructed
from the BENCH_r11 stdout tail).
"""
import json
import sys

MIN_KEYS = 50

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
try:
    rec = json.load(open(src))
    queries = rec["queries"]
except Exception as e:  # noqa: BLE001 - any parse failure is a refusal
    sys.exit(f"refusing: cannot read a bench record from {src}: {e}")
if len(queries) < MIN_KEYS:
    sys.exit(f"refusing: {src} has only {len(queries)} query keys "
             f"(< {MIN_KEYS}) — a subset run, not a triage baseline")
out = {
    "_provenance": f"copied from {src} by scripts/refresh_bench_prev.py "
                   "(run at round start, while target/bench.json holds "
                   "the previous driver record)",
    "value": rec.get("value"),
    "sf": rec.get("sf"),
    "queries": queries,
}
json.dump(out, open("bench_prev.json", "w"), indent=1, sort_keys=True)
print(f"bench_prev.json <- {src}: {len(queries)} keys, "
      f"total {rec.get('value')}")
