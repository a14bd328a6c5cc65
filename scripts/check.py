#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: runs each oracle SQL in
DuckDB against the same parquet tables and compares with the Verify output
(column names sorted, rows sorted, values compared exactly)."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    sdf = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'").fetchdf()
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f"FAIL {name}: cols oracle={list(odf.columns)} spark={list(sdf.columns)}")
        fails += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}"); fails += 1; continue
    o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)

    # Strict, driver-like canonicalization: the driver hashes values, so
    # int64 3 vs float64 3.0 and 0.0 vs -0.0 must FAIL here too (pandas ==
    # would hide both). repr() distinguishes all of these.
    def canon(v):
        try:
            if v != v:  # NaN/NaT
                return "<na>"
        except Exception:
            pass
        if v is None:
            return "<na>"
        return repr(v)

    diffs = []
    for c in o.columns:
        oc, sc = o[c].map(canon), s[c].map(canon)
        eq = oc == sc
        if not eq.all():
            bad = (~eq).idxmax()
            diffs.append(f"col {c}: first diff row {bad}: oracle={oc[bad]} spark={sc[bad]} "
                         f"({int((~eq).sum())} rows differ)")
    if diffs:
        print(f"FAIL {name}: " + "; ".join(diffs)); fails += 1
    else:
        print(f"ok   {name} ({len(o)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle-checked queries pass")
sys.exit(1 if fails else 0)
