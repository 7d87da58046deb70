#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against the Spark result parquet
written by graft.Verify. Usage: compare.py <sfDir> <verifyOutDir>.

Also the ORACLE-BUDGET GUARD (the round-10 failure mode: one 350 s oracle
blew the driver's ~10-min DuckDB budget and zeroed the round's correctness
artifact): every oracle is timed, the sweep table is rewritten into
tools/ORACLE_TIMES.md below its auto-gen marker, and — at the driver's gate
scale (sf0.01, or when ORACLE_BUDGET_ENFORCE=1) — the run FAILS if the full
sweep exceeds ORACLE_BUDGET_TOTAL (default 300 s) or any single oracle
exceeds ORACLE_BUDGET_SINGLE (default 20 s). A key whose oracle is too
expensive must fix the oracle, not ship and hope."""
import sys, json, glob, os, re, time
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails, passes, times = [], [], []
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        t0 = time.monotonic()
        duck = con.execute(sql).df()
        times.append((name, time.monotonic() - t0))
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

# ---- oracle-budget guard + auto-generated timing table ----
budget_total = float(os.environ.get("ORACLE_BUDGET_TOTAL", "300"))
budget_single = float(os.environ.get("ORACLE_BUDGET_SINGLE", "20"))
enforce = (os.path.basename(os.path.normpath(sfdir)) == "sf0.01"
           or os.environ.get("ORACLE_BUDGET_ENFORCE") == "1")
total_t = sum(t for _, t in times)
slowest = sorted(times, key=lambda x: -x[1])[:20]
print(f"\n[oracle-budget] {len(times)} oracles, total {total_t:.1f}s "
      f"(budget {budget_total:.0f}s), slowest "
      + ", ".join(f"{n} {t:.2f}s" for n, t in slowest[:3]))
marker = "<!-- AUTO-GENERATED: latest gate sweep below; edited by tools/compare.py -->"
# Only a FULL sweep may rewrite the committed table: a partial/dev run —
# an incomplete verify dir (oracles skipped on "no spark output" are never
# timed) OR a subset Verify run (which narrows oracle_sql.json itself) —
# must not replace the full-gate sweep with a misleadingly small total.
# "Full" = every oracle in this run timed AND the sweep is at least as
# large as the committed one (the catalog only grows).
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ORACLE_TIMES.md")
prev_n = 0
if os.path.exists(path):
    m = re.search(r"\*\*(\d+) oracles, total", open(path).read())
    prev_n = int(m.group(1)) if m else 0
full_sweep = len(times) == len(oracle) and len(times) >= prev_n
if not full_sweep:
    print(f"[oracle-budget] partial run ({len(times)}/{len(oracle)} oracles timed, "
          f"committed sweep {prev_n}); ORACLE_TIMES.md left untouched")
else:
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ORACLE_TIMES.md")
        head = open(path).read().split(marker)[0] if os.path.exists(path) else "# Oracle timing\n\n"
        tbl = "\n".join(f"| `{n}` | {t:.2f} |" for n, t in slowest)
        open(path, "w").write(
            f"{head}{marker}\n\n## Latest gate sweep ({os.path.basename(os.path.normpath(sfdir))}, "
            f"{time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())})\n\n"
            f"**{len(times)} oracles, total {total_t:.1f} s** "
            f"(budgets: total {budget_total:.0f} s, single {budget_single:.0f} s, "
            f"{'ENFORCED' if enforce else 'report-only at this sf'}). Slowest 20:\n\n"
            f"| oracle | sec |\n|---|---|\n{tbl}\n")
    except Exception as e:
        print(f"[oracle-budget] ORACLE_TIMES.md update skipped: {e}")
over_single = [(n, t) for n, t in times if t > budget_single]
budget_fail = []
if total_t > budget_total:
    budget_fail.append(f"full sweep {total_t:.1f}s > {budget_total:g}s budget")
for n, t in over_single:
    budget_fail.append(f"oracle {n} {t:.1f}s > {budget_single:g}s budget")
if budget_fail:
    verdict = "FAIL" if enforce else "WARN (not enforced at this sf)"
    for msg in budget_fail:
        print(f"[oracle-budget] {verdict}: {msg}")
    if enforce and not fails:
        sys.exit(2)
sys.exit(1 if fails else 0)
