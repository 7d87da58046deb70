#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against the Spark result parquet
written by graft.Verify. Usage: compare.py <sfDir> <verifyOutDir>."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    spark = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    # driver semantics: sort columns by name, then row-sort, then compare
    duck = duck[sorted(duck.columns)]
    spark_cols = sorted(spark.columns)
    if sorted(duck.columns) != spark_cols:
        fails.append((name, f"schema mismatch: duck={sorted(duck.columns)} spark={spark_cols}"))
        continue
    spark = spark[spark_cols]
    if len(duck) != len(spark):
        fails.append((name, f"row count: duck={len(duck)} spark={len(spark)}"))
        continue
    ds = duck.sort_values(by=list(duck.columns), ignore_index=True)
    ss = spark.sort_values(by=list(spark.columns), ignore_index=True)
    mismatch = None
    for c in duck.columns:
        a, b = ds[c], ss[c]
        try:
            eq = (a.astype(str).fillna("<null>") == b.astype(str).fillna("<null>"))
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"
            break
        if not eq.all():
            i = eq.idxmin()
            mismatch = (f"col {c} dtype duck={a.dtype}/spark={b.dtype} first diff row {i}: "
                        f"duck={a[i]!r} spark={b[i]!r} ({int((~eq).sum())} diffs)")
            break
    if mismatch:
        fails.append((name, mismatch))
    else:
        passes.append((name, len(duck)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
