#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs graft.Verify at a given SF dir, then executes each oracle SQL in
DuckDB against the same parquet tables and compares:
  - columns sorted by name on both sides
  - rows sorted by all columns
  - exact value equality (floats must match bitwise after the query's
    own rounding; near-misses are reported separately to debug FP).

Usage: python tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    # wipe stale outputs: Verify only clears a query dir on success, so
    # a prior run's parquet would otherwise mask a now-failing query
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify run failed")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # duckdb HUGEINT -> object/float guard
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "int64", "uint32"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ok = fail = 0
for name, sql in sorted(oracle.items()):
    pq_path = OUT / name
    if not pq_path.exists():
        print(f"FAIL {name}: spark output missing")
        fail += 1
        continue
    spark_df = normalize(pd.read_parquet(pq_path))
    try:
        duck_df = normalize(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fail += 1
        continue
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
            exact = ((af == bf) | (af.isna() & bf.isna())).all()
            close = (((af - bf).abs() < 1e-9) | (af.isna() & bf.isna())).all()
            if not exact:
                mism.append((c, "float-near" if close else "float-far"))
        else:
            if not (a.astype(str) == b.astype(str)).all():
                mism.append((c, "value"))
    if mism:
        print(f"FAIL {name}: {mism}")
        for c, _ in mism[:2]:
            diff = spark_df[c].astype(str) != duck_df[c].astype(str)
            idx = diff[diff].index[:5] if diff.any() else spark_df.index[:3]
            print(pd.DataFrame({"spark": spark_df[c][idx], "duck": duck_df[c][idx]}))
        fail += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")
        ok += 1

print(f"\n{ok} ok, {fail} fail")

# Same-window guard: warn when the committed bench/baseline snapshot
# pair drifted (different commit, or generated far apart) — a ratio
# across drifted snapshots is not a measurement. Warning only: the
# correctness gate above is this script's exit status.
repo = Path(__file__).parent.parent
bm, blm = repo / "bench_manifest.json", repo / "baseline_manifest.json"
if bm.exists() and blm.exists():
    # warn-only guard: a malformed manifest must not flip the
    # correctness exit status
    try:
        b, bl = json.loads(bm.read_text()), json.loads(blm.read_text())
    except ValueError as e:
        print(f"WARN unparseable bench/baseline manifest: {e}")
        b, bl = {}, {}
    # compare the src/ TREE hash when both manifests carry it (a
    # docs-only commit between the runs doesn't change the measured
    # engine); fall back to the commit SHA for older manifests
    key = "src_tree" if ("src_tree" in b and "src_tree" in bl) else "git_sha"
    if b.get(key) != bl.get(key):
        print(f"WARN bench/baseline manifests from different {key}: "
              f"{b.get(key, '?')[:12]} vs {bl.get(key, '?')[:12]} "
              f"- regenerate the pair back-to-back")
    drift = abs(int(b.get("generated_unix", 0)) - int(bl.get("generated_unix", 0)))
    if drift > 6 * 3600:
        print(f"WARN bench/baseline manifests generated {drift / 3600:.1f}h apart "
              f"- regenerate the pair in one window")
elif bm.exists() != blm.exists():
    print("WARN only one of bench_manifest.json / baseline_manifest.json exists "
          "- regenerate both in one window")

sys.exit(1 if fail else 0)
