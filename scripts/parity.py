#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the same parquet tables
and compares against the parquet that graft.Verify dumped: schema
(column names), row count, and value-hash (rows sorted, columns sorted
by name, values stringified with float rounding like a tolerant
driver would NOT do — we compare exact first, then report near-misses).

Usage: parity.py <sfdir> <verify_outdir> [comma-separated-names]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes = [], []
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    sql = oracle[name]
    pq_dir = f"{outdir}/{name}"
    try:
        got = duckdb.sql(f"SELECT * FROM '{pq_dir}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append((name, f"schema: got {sorted(got.columns)} want {sorted(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: got {len(got)} want {len(exp)}")); continue
    if len(exp) == 0:
        fails.append((name, "oracle returned 0 rows (driver may flag empty)")); continue
    g, e = canon(got), canon(exp)
    diffs = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        # The driver's hasher stringifies values verbatim, so an
        # integer column on one side and a float on the other
        # ("149174" vs "149174.0") hash-mismatches even when the
        # values are numerically equal. parity must be at least as
        # strict: an int-vs-float dtype divergence is a FAIL here,
        # never silently coerced (r17's curate_domain_stats lesson —
        # DuckDB HUGEINT sums surface as float64 in pandas).
        gk, ek = gv.dtype.kind, ev.dtype.kind
        if (gk in 'iu' and ek == 'f') or (gk == 'f' and ek in 'iu'):
            diffs.append(f"{c}: dtype mismatch got {gv.dtype} want {ev.dtype} "
                         "(int-vs-float diverges under the driver's hasher)")
            continue
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            gv2, ev2 = gv.astype(float), ev.astype(float)
            both_nan = gv2.isna() & ev2.isna()
            neq = ~both_nan & (gv2 != ev2)
            if neq.any():
                mx = np.nanmax(np.abs(gv2[neq].values - ev2[neq].values))
                diffs.append(f"{c}: {neq.sum()} float diffs, max abs {mx:.3e}")
        else:
            gs, es = gv.astype(str), ev.astype(str)
            neq = gs != es
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"{c}: {neq.sum()} diffs, e.g. got={gs[i]!r} want={es[i]!r}")
    if diffs:
        fails.append((name, "; ".join(diffs)))
    else:
        passes.append((name, len(got)))

rowsonly = [q for q in json.load(open(f"{outdir}/queries.json"))] if os.path.exists(f"{outdir}/queries.json") else []
for name in sorted(set(os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)) - set(oracle)):
    if only is not None and name not in only:
        continue
    try:
        n = len(duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        status = "rows-only OK" if n > 0 else "rows-only EMPTY!"
        passes.append((name, f"{n} ({status})"))
    except Exception as e:
        fails.append((name, f"rows-only output unreadable: {e}"))

print(f"== PASS ({len(passes)}) ==")
for n, c in passes: print(f"  {n}: {c}")
print(f"== FAIL ({len(fails)}) ==")
for n, m in fails: print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
