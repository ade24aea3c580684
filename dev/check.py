#!/usr/bin/env python3
"""Dev-loop oracle differential check (mimics the driver's t2 gate).

Usage: python3 dev/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name>/ parquet written by `sbt "runMain graft.Verify"`,
runs <out>/oracle_sql.json's SQL in DuckDB over the sf parquet tables, and
compares: column names (sorted), row counts, and every value in row order.
"""
import duckdb, sys, json, glob, os, math

out, sf = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        spark_files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not spark_files:
            bad.append((name, "no spark output")); continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"exec error: {str(e).splitlines()[0]}")); continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        bad.append((name, f"cols {scols} vs {ocols}")); continue
    if len(sdf) != len(odf):
        bad.append((name, f"rows {len(sdf)} vs {len(odf)}")); continue
    sdf, odf = sdf[scols], odf[scols]
    diff = None
    for i in range(len(sdf)):
        for c in scols:
            a, b = sdf[c].iloc[i], odf[c].iloc[i]
            # list/array cells (numpy arrays from DuckDB fetchdf) break
            # scalar null checks — normalize to plain lists up front
            if hasattr(a, "tolist"):
                a = a.tolist()
            if hasattr(b, "tolist"):
                b = b.tolist()
            if a is None and b is None:
                continue
            try:
                an = a != a  # NaN-safe null check
                bn = b != b
            except Exception:
                an = bn = False
            if (an or a is None) and (bn or b is None):
                continue
            if isinstance(a, float) or isinstance(b, float):
                if (a is None) != (b is None) or a != b:
                    diff = (i, c, a, b); break
            elif str(a) != str(b):
                diff = (i, c, a, b); break
        if diff:
            break
    if diff:
        bad.append((name, f"row {diff[0]} col {diff[1]}: spark={diff[2]!r} oracle={diff[3]!r}"))
    else:
        ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
if bad:
    print(f"FAIL {len(bad)}:")
    for n, why in bad:
        print(f"  {n}: {why}")
    sys.exit(1)
