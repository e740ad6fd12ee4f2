#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [only]

For every query dumped by graft.Verify: run its oracle SQL in DuckDB over
the same parquet tables, sort columns by name, and compare row-by-row
(exact for ints/strings, exact-with-nan-care for floats).

`only` (comma-separated query names) restricts the compare to a subset,
matching a Verify run made with SPARK_GRAFT_ONLY — missing-dump
enforcement then applies to just that subset. The driver passes no
`only` and gets the full-registry check.
"""
import json, math, sys
import hashlib, struct
from decimal import Decimal
import duckdb


def canon(v):
    """Canonical string form of one value — the Python mirror of
    graft.Verify.canon (same rules, by contract). Lets a hash failure be
    localized to a COLUMN: Verify writes _colhash/<q>.json sidecars from
    the Spark dump; we recompute the same hashes from DuckDB's rows."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(struct.unpack(">Q", struct.pack(">d", v))[0], "016x")
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, tuple):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        # DuckDB STRUCT → canon as Spark Row (field order). A Spark
        # MapType would also arrive as a dict and mismatch the sidecar's
        # sorted '<k=v,...>' form — unreachable today because ContractSpec
        # pins every ORACLED output column to scalar types (maps appear
        # only in rows-only dumps, which never reach this compare); if a
        # map-typed oracled column ever lands, split this branch on the
        # dump schema rather than guessing from the value.
        return "{" + ",".join(canon(x) for x in v.values()) + "}"
    import datetime
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        us = (v - epoch) // datetime.timedelta(microseconds=1)
        return str(us)
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def col_hashes(cols, rows):
    """column → md5 of the NUL-joined canonical value stream (row order)."""
    digests = [hashlib.md5() for _ in cols]
    for row in rows:
        for i, v in enumerate(row):
            digests[i].update(canon(v).encode("utf-8"))
            digests[i].update(b"\x00")
    return {c: d.hexdigest() for c, d in zip(cols, digests)}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(norm(row[i]) for i in order))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, only=None):
    # sidecars/error markers live in a SIBLING of the dump dir (the
    # driver reads every dump-dir entry as a parquet dataset — round 10),
    # keyed by the dump dir's basename so sibling dump dirs never share
    # (or sweep) each other's meta (round 12, mirrors Verify.scala)
    import os
    dump_abs = os.path.abspath(out_dir)
    meta_dir = os.path.join(
        os.path.dirname(dump_abs),
        "graft_meta_" + os.path.basename(dump_abs))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    import glob, os
    have = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/q*")
                  if os.path.isdir(p))
    # A query that crashed in Verify leaves no dump dir — surface those as
    # FAIL (round 3's q35 crash silently vanished from the report).
    for name in sorted(set(oracle) - set(have)):
        err = f"{meta_dir}/_errors/{name}.txt"
        msg = open(err).read() if os.path.exists(err) else "no dump written"
        print(f"FAIL {name}: MISSING from dump dir: {msg[:200]}")
        n_fail += 1
    for name in have:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols, got = rows_of(got_rel)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows"
                  + ("  !! EMPTY" if not got else ""))
            continue
        try:
            ecols, exp = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        # per-column verdicts (VERDICT r9 task 2): localize any
        # divergence to named columns, and cross-check the Scala-side
        # sidecar so a canonicalization drift between Verify.canon and
        # canon() above surfaces here instead of muddying a diagnosis
        gh, eh = col_hashes(gcols, got), col_hashes(ecols, exp)
        # .get: unreachable-today guard (gcols==ecols is checked above),
        # but a future reorder or duplicate column name must degrade to a
        # plain mismatch, not a KeyError traceback that kills the run
        badcols = [c for c in gcols if gh[c] != eh.get(c)]
        side = f"{meta_dir}/_colhash/{name}.json"
        if os.path.exists(side):
            sc = json.load(open(side))
            drift = [c for c in gcols
                     if c in sc and sc[c] != gh[c]]
            if drift:
                print(f"  !! {name}: sidecar/py canon drift on {drift} "
                      "(Verify.canon vs check.canon disagree — fix the "
                      "canonicalizers, the data may be fine)")
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; "
                  f"divergent columns: {badcols}; "
                  f"first at {i}:\n  spark={g}\n  duck ={e}\n  cols={gcols}")
            n_fail += 1
        elif badcols:
            # value-equal but canonical-form-different (±0.0, decimal
            # scale): the kind of latent divergence a stricter driver
            # hash could trip on — warn loudly, don't fail the gate
            print(f"  ok {name}: {len(got)} rows  "
                  f"!! canonical-form divergence in {badcols} "
                  "(values equal; e.g. -0.0 vs 0.0 or decimal scale)")
            n_pass += 1
        else:
            print(f"  ok {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail "
          f"({len(have) - n_pass - n_fail} rows-only)")
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       sys.argv[3] if len(sys.argv) > 3 else None) else 0)
