#!/usr/bin/env python3
"""Driver-style oracle parity check (development aid, not shipped code).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 dev/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

Runs every SparkEntry.oracleSql query in DuckDB over the parquet testdata
and compares row multisets (column-name-sorted, canonicalized, hashed)
against the Spark outputs graft.Verify wrote — the same shape as the
driver's CORRECTNESS gate.
"""
import json, glob, os, sys, hashlib
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif hasattr(v, "item") and not isinstance(v, (list, tuple)):
                x = v.item()
                vals.append(f"{x:.6g}" if isinstance(x, float) else str(x))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)

bad = []
skip = set(os.environ.get("ORACLE_SKIP", "").split(",")) - {""}
for name, sql in sorted(oracle.items()):
    if name in skip:
        continue
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        bad.append((name, "missing spark output")); continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
        ignore_index=True)
    try:
        ora_df = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle error: {e}")); continue
    h1, n1 = canon(spark_df)
    h2, n2 = canon(ora_df)
    if n1 != n2:
        bad.append((name, f"rows {n1} vs {n2}"))
    elif h1 != h2:
        bad.append((name, f"hash mismatch ({n1} rows)"))

print(f"checked {len(oracle) - len(skip & set(oracle))} oracle queries" + (f" (skipped {sorted(skip & set(oracle))})" if skip & set(oracle) else ""))
for n, why in bad:
    print("MISMATCH", n, why)
sys.exit(1 if bad else 0)
