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
# the drift-triage baseline is ONLY meaningful at the driver's bench
# SF: a full-suite record from another scale factor would flag (or
# hide) every key when Bench divides current sf0.1 times by it
EXPECTED_SF = "sf0.1"


def check_rec(rec, what):
    queries = rec["queries"]
    if len(queries) < MIN_KEYS:
        raise ValueError(f"{what}: only {len(queries)} query keys "
                         f"(< {MIN_KEYS}) — a subset run, not a "
                         "triage baseline")
    sf = str(rec.get("sf", ""))
    if not sf.rstrip("/").endswith(EXPECTED_SF):
        raise ValueError(f"{what}: recorded at sf={sf!r}, not "
                         f"{EXPECTED_SF} — wrong-scale baseline")
    return queries


src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
try:
    rec = json.load(open(src))
    queries = check_rec(rec, src)
except Exception as e:  # noqa: BLE001 - any parse failure triggers fallback
    # r13: Bench appends every FULL-suite run to an append-only
    # target/bench_history.jsonl (subset runs never do), so a smoke-run
    # clobber of bench.json no longer loses the record — take the
    # newest USABLE history line (full suite AND the right SF) instead
    # of refusing outright.
    hist = "target/bench_history.jsonl"
    try:
        rec = None
        for ln in reversed([ln for ln in open(hist) if ln.strip()]):
            cand = json.loads(ln)
            try:
                queries = check_rec(cand, "history line")
                rec = cand
                break
            except ValueError:
                continue
        if rec is None:
            raise ValueError("no full-suite line at the expected SF")
        src = f"{hist} (newest usable line; {src} was unusable: {e})"
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
