#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query, compare
the Verify parquet dump against the DuckDB oracle on the same tables.
Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pq.read_table(f).to_pandas()
                         for f in glob.glob(f"{pdir}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fails += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            # int-vs-float dtype skew (e.g. DuckDB HUGEINT -> float64)
            # hashes differently driver-side even when numerically equal
            if {gv.dtype.kind, ev.dtype.kind} & {'i', 'u'}:
                bad = (c, str(gv.dtype), str(ev.dtype), -1); break
            gq = gv.astype('float64'); eq = ev.astype('float64')
            eqmask = (gq == eq) | (gq.isna() & eq.isna())
        else:
            eqmask = (gv.astype(object).where(pd.notna(gv), None) ==
                      ev.astype(object).where(pd.notna(ev), None)) | \
                     (pd.isna(gv) & pd.isna(ev))
        if not bool(eqmask.all()):
            i = int(np.argmin(eqmask.values))
            bad = (c, g[c].iloc[i], e[c].iloc[i], i); break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[3]}: got {bad[1]!r} want {bad[2]!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
