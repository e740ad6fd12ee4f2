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


def read_rec(path):
    rec = json.load(open(path))
    return rec, rec["queries"]


src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
try:
    rec, queries = read_rec(src)
    if len(queries) < MIN_KEYS:
        raise ValueError(f"only {len(queries)} query keys (< {MIN_KEYS})"
                         " — a subset run, not a triage baseline")
except Exception as e:  # noqa: BLE001 - any parse failure triggers fallback
    # r13: Bench appends every FULL-suite run to an append-only
    # target/bench_history.jsonl (subset runs never do), so a smoke-run
    # clobber of bench.json no longer loses the record — take the
    # newest history line instead of refusing outright.
    hist = "target/bench_history.jsonl"
    try:
        last = [ln for ln in open(hist) if ln.strip()][-1]
        rec = json.loads(last)
        queries = rec["queries"]
        assert len(queries) >= MIN_KEYS
        src = f"{hist} (last line; {src} was unusable: {e})"
    except Exception as e2:  # noqa: BLE001
        sys.exit(f"refusing: {src}: {e}; history fallback {hist}: {e2}")
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
