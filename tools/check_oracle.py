#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate:
run each oracle SQL in DuckDB against the sf tables, compare to the
parquet dumped by graft.Verify (column-name-sorted, row-sorted, value
compare). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
# evidence completeness: every query the manifest declares must have an
# output dir — a query that threw during Verify is a FAILURE, not a skip
mpath = os.path.join(out, "manifest.json")
if os.path.exists(mpath):
    declared = set(json.load(open(mpath)))
    present = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
    for missing in sorted(declared - present):
        fails += 1
        print(f"{missing:28s} MISSING (declared in manifest, no output)")
for qname in sorted(os.listdir(out)):
    qdir = os.path.join(out, qname)
    if not os.path.isdir(qdir):
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    if qname not in oracle:
        status = f"rows-only ({len(got)} rows)" if len(got) > 0 else "EMPTY (rows-only FAIL)"
        if len(got) == 0:
            fails += 1
        print(f"{qname:28s} {status}")
        continue
    exp = con.execute(oracle[qname]).fetchdf()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    ok_schema = list(got.columns) == list(exp.columns)
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    ok_rows = len(g) == len(e)
    ok_vals = ok_schema and ok_rows and g.astype(str).equals(e.astype(str))
    if ok_schema and ok_rows and ok_vals:
        print(f"{qname:28s} OK ({len(g)} rows)")
    else:
        fails += 1
        print(f"{qname:28s} MISMATCH schema={ok_schema} rows={len(g)}vs{len(e)} vals={ok_vals}")
        if ok_schema and ok_rows:
            diff = (g.astype(str) != e.astype(str))
            cols = [c for c in g.columns if diff[c].any()]
            print(f"  differing cols: {cols}")
            idx = diff.any(axis=1)
            print("  got:", g[idx].head(3).to_dict("records"))
            print("  exp:", e[idx].head(3).to_dict("records"))
        elif not ok_schema:
            print(f"  got cols: {list(got.columns)}\n  exp cols: {list(exp.columns)}")
sys.exit(1 if fails else 0)
