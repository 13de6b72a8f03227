#!/usr/bin/env python3
"""Local mimic of the driver's correctness check (for builder iteration only;
not part of the library). Runs each oracle_sql.json query in DuckDB against
the sf parquet tables, loads the Spark parquet dump, sorts columns by name +
rows, and diffs exactly."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if not os.path.exists(p):
        continue  # scaled probe dirs may carry only one table family
    # driver testdata is single-file parquet; Spark-written scale dirs are
    # directories of part files
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# On a filtered Verify run the manifest lists only the queries executed;
# restrict the oracle sweep to those so the exit code reflects real
# mismatches, not not-run queries. A full Verify run lists every query.
manifest_path = f"{out_dir}/ran_queries.json"
if os.path.exists(manifest_path):
    ran = set(json.load(open(manifest_path)))
    skipped = sorted(set(oracle) - ran)
    if skipped:
        print(f"SKIP {len(skipped)} queries not in this run's manifest")
    oracle = {k: v for k, v in oracle.items() if k in ran}

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

# Oracle walls at scale: DuckDB's recursive-CTE transitive closures
# materialize per-vertex reachability sets (sum |component|^2 rows) and
# OOM on the x10+ blowup corpora (BASELINE.md r9); the engine-side
# graft.CcAudit covers those closures at x10/x100 instead. Queries named
# in SKIP_ORACLE (comma list) get a rows-only check on the Spark dump and
# are reported separately, never silently.
skip_oracle = set(filter(None, os.environ.get("SKIP_ORACLE", "").split(",")))
rows_only = []

fails = []
for name, sql in sorted(oracle.items()):
    if name in skip_oracle:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        nrows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        if nrows > 0:
            print(f"ROWS {name}: {nrows} rows (oracle skipped: scale wall)")
            rows_only.append(name)
        else:
            print(f"FAIL {name}: no spark output (oracle skipped)")
            fails.append(name)
        continue
    # check for spark output BEFORE running the oracle: on a filtered
    # Verify run (builder iteration) the dump holds a few queries, and
    # running all ~143 DuckDB oracles anyway can grind for minutes on a
    # scaled dir (recursive-CTE cluster oracles over a 50k-doc corpus)
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output (oracle not executed)")
        fails.append(name); continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns got={sorted(got.columns)} want={sorted(want.columns)}")
        fails.append(name); continue
    g, w = canon(got), canon(want)
    if len(g) != len(w):
        print(f"FAIL {name}: rows got={len(g)} want={len(w)}")
        fails.append(name); continue
    # exact value compare (driver hashes values; we diff cell-wise)
    diff_cols = []
    for c in g.columns:
        a, b = g[c], w[c]
        try:
            same = (a.astype(object).where(pd.notna(a), None) ==
                    b.astype(object).where(pd.notna(b), None))
            # None == None -> False in pandas object compare; fix
            both_null = pd.isna(a).values & pd.isna(b).values
            ok = (same.values | both_null).all()
        except Exception:
            ok = False
        if not ok:
            diff_cols.append(c)
    if diff_cols:
        print(f"FAIL {name}: value mismatch in {diff_cols}")
        for c in diff_cols[:2]:
            mask = ~((g[c].astype(object).where(pd.notna(g[c]), None) ==
                      w[c].astype(object).where(pd.notna(w[c]), None)) |
                     (pd.isna(g[c]).values & pd.isna(w[c]).values))
            print("  got :", g.loc[mask].head(3).to_dict("records"))
            print("  want:", w.loc[mask].head(3).to_dict("records"))
        fails.append(name); continue
    # dtype mismatch is a hard FAIL: the driver hashes stringified values, so
    # int64 149 vs float64 149.0 passes Python == but breaks the driver hash
    # (r4 lesson: ops_revenue_share). Whitelist only pairs whose string forms
    # are provably identical cell-for-cell.
    dt = []
    for c in g.columns:
        gd, wd = str(g[c].dtype), str(w[c].dtype)
        if gd == wd:
            continue
        # same stringified values => same driver hash, regardless of dtype label
        gs = g[c].map(lambda v: None if pd.isna(v) else str(v))
        ws = w[c].map(lambda v: None if pd.isna(v) else str(v))
        if not gs.equals(ws):
            dt.append((c, gd, wd))
    if dt:
        print(f"FAIL {name}: dtype mismatch (driver-hash hazard): {dt}")
        fails.append(name); continue
    print(f"OK   {name}: {len(g)} rows")

ok_n = len(oracle) - len(fails) - len(rows_only)
if rows_only:
    print(f"\n{ok_n}/{len(oracle)} OK, {len(rows_only)} rows-only (oracle scale wall), {len(fails)} FAIL")
else:
    print(f"\n{ok_n}/{len(oracle)} OK")

# optional machine-readable artifact (the x10 sweep commits this)
art = os.environ.get("COMPARE_JSON_OUT")
if art:
    ok = sorted(set(oracle) - set(fails) - set(rows_only))
    json.dump({"sf_dir": sf_dir, "total": len(oracle), "ok": len(ok),
               "rows_only": sorted(rows_only), "fail": sorted(fails),
               "ok_queries": ok}, open(art, "w"), indent=1)
sys.exit(1 if fails else 0)
