#!/usr/bin/env python3
"""Dev-loop subset of tools/check.py: verify+compare only the named
queries. Usage: python tools/devcheck.py q29_correlated[,name2] [sfdir]"""
import json
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

NAMES = sys.argv[1]
SFDIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = Path("/tmp/devcheck_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    # wipe the named outputs first: Verify only clears a query's dir on
    # SUCCESS, so a stale parquet from an earlier run would otherwise be
    # compared (and pass) when the query now fails
    # ... including the auxiliary dumps the {{OUT}}-reading oracles
    # consume (candidate pairs / cells), which check.py's full rmtree
    # covers but a per-name wipe would miss
    import shutil
    for name in NAMES.split(","):
        for aux in (name, f"{name}_pairs", f"{name}_cand"):
            shutil.rmtree(OUT / aux, ignore_errors=True)
    if "dedup_semantic" in NAMES.split(","):
        shutil.rmtree(OUT / "dedup_semantic_cells", ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT} {NAMES}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify run failed")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
oracle = json.loads((OUT / "oracle_sql.json").read_text())


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "int64", "uint32"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


fail = 0
for name in NAMES.split(","):
    pq = OUT / name
    if not pq.exists():
        print(f"FAIL {name}: spark output missing")
        fail += 1
        continue
    spark_df = normalize(pd.read_parquet(pq))
    if name not in oracle:
        print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
        continue
    duck_df = normalize(con.execute(oracle[name]).df())
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1
        continue
    mism = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            af, bf = a.astype(float), b.astype(float)
            if not ((af == bf) | (af.isna() & bf.isna())).all():
                mism.append(c)
        elif not (a.astype(str) == b.astype(str)).all():
            mism.append(c)
    if mism:
        print(f"FAIL {name}: {mism}")
        fail += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")
sys.exit(1 if fail else 0)
