#!/usr/bin/env python3
"""10x crossover artifact builder (VERDICT r10 item 6).

For the named queries, measure BOTH engines on the 10x-replicated
tmp/sf1probe data (build it first with tools/scaleprobe.py if absent):

  - engine: graft.Bench subset mode (min-of-2 warm passes, the same
    harness the driver runs) -> bench_out_subset.json
  - oracle: the committed DuckDB oracle SQL (median of 3 runs) over
    the same parquet tables

and write crossover_10x.json {query: {engine_s, oracle_s, ratio}}.
The fixed multi-stage dispatch floor that dominates small-SF ratios
amortizes with data; this artifact is the stable evidence that the
many-stage designs (kn fits, label propagation, substring dedup)
cross below their oracle as data grows.

Usage: python tools/crossprobe.py q50_label_propagation,text_lm_kn5[,...]
"""
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).parent.parent
SFDIR = str(REPO / "tmp" / "sf1probe")
NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "q50_label_propagation", "text_lm_kn5", "text_lm_kn3",
    "dedup_substring", "stream_cms"]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# oracle SQL from the most recent gate dump (the SQL text does not
# depend on the sf dir; run tools/check.py first if missing)
oracle_path = Path("/tmp/verify_out/oracle_sql.json")
if not oracle_path.exists():
    sys.exit("run tools/check.py first (needs /tmp/verify_out/oracle_sql.json)")
oracle = json.loads(oracle_path.read_text())

# engine: Bench subset (min-of-2 warm passes at SFDIR)
env = dict(**__import__("os").environ,
           SPARK_GRAFT_SF_DIR=SFDIR, SPARK_GRAFT_CPUS="32",
           SPARK_GRAFT_ONLY=",".join(NAMES))
r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, capture_output=True, text=True, env=env)
bench_path = REPO / "bench_out_subset.json"
if not bench_path.exists():
    print(r.stdout[-3000:])
    sys.exit("bench subset run failed")
bench = json.loads(bench_path.read_text())["queries"]

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

result = {}
for name in NAMES:
    sql = oracle.get(name)
    if sql is None:
        print(f"skip {name}: no oracle sql")
        continue
    times = []
    for _ in range(3):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    o = statistics.median(times)
    e = bench.get(name)
    result[name] = {"engine_s": round(e, 3) if e is not None else None,
                    "oracle_s": round(o, 3),
                    "ratio": round(e / o, 3) if e is not None else None}
    if e is not None:
        print(f"{name}: engine {e}s vs oracle {o:.2f}s = {e / o:.2f}x")
    else:
        print(f"{name}: engine missing from bench subset; oracle {o:.2f}s")

sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                     capture_output=True, text=True).stdout.strip()
(REPO / "crossover_10x.json").write_text(json.dumps(
    {"sf": SFDIR, "git_sha": sha, "method":
     "engine min-of-3 warm (Bench subset) vs DuckDB median-of-3, same host",
     "queries": result}, indent=1) + "\n")
print("wrote crossover_10x.json")
