#!/usr/bin/env python3
"""10x crossover artifact builder (VERDICT r10 item 6).

For the named queries, measure BOTH engines on the 10x-replicated
tmp/sf1probe data (build it first with tools/scaleprobe.py if absent):

  - engine: graft.Bench subset mode (min-of-3 warm passes, the same
    harness the driver runs) -> bench_out_subset.json
  - oracle: the committed DuckDB oracle SQL (median of 3 runs) over
    the same parquet tables

and write crossover_10x.json {query: {engine_s, oracle_s, ratio}}.
The fixed multi-stage dispatch floor that dominates small-SF ratios
amortizes with data; this artifact is the stable evidence that the
many-stage designs (kn fits, label propagation, substring dedup)
cross below their oracle as data grows.

Usage: python tools/crossprobe.py q50_label_propagation,text_lm_kn5[,...] [probe_verify_outdir]

The optional second argument points at a `graft.Verify` dump made AT
THE PROBE SF (subset runs are enough since round 14: `runMain
graft.Verify tmp/sf1probe /tmp/verify_sf1 name1,name2`). It is needed
for rows whose oracle reads Verify-dumped inputs ({{OUT}} pairs
parquet, recall-gate candidate sets): their /tmp/verify_out entries
point at sf0.01 dumps, which would make a 10x oracle timing
meaningless. Entries found there override the sf0.01 ones, and any
`ann_*_recall` row with a gate_bars.json entry there is timed as the
baseline.py-style REAL gate recompute (brute-force ground truth +
rank/hit aggregation over the probe-SF candidate dump) instead of its
constant-probe correctness oracle.
"""
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

import duckdb

import gatesql

REPO = Path(__file__).parent.parent


def _head_sha():
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
# CROSSPROBE_SFDIR / CROSSPROBE_OUT (round 15): point the same harness
# at the 100x tree (tmp/sf10probe from tools/scaleprobe100.py) and
# write crossover_100x.json — the evidence VERDICT r14 asks for on
# rows whose 10x ratio is >2x of a sub-second oracle ("the gap closes
# with data" must be MEASURED past 10x, not asserted).
SFDIR = os.environ.get("CROSSPROBE_SFDIR", str(REPO / "tmp" / "sf1probe"))
OUT_NAME = os.environ.get("CROSSPROBE_OUT", "crossover_10x.json")
# fail fast on an SFDIR/OUT mismatch: without this, pointing SFDIR at
# the 100x tree while OUT still names the 10x artifact would wipe the
# committed 10x rows (the merge drops prior rows whose "sf" differs)
# and leave one 100x row under a filename that says 10x
if (REPO / OUT_NAME).exists():
    _prior_sf = json.loads((REPO / OUT_NAME).read_text()).get("sf")
    if _prior_sf and _prior_sf != SFDIR:
        sys.exit(f"{OUT_NAME} holds rows measured at sf={_prior_sf} but "
                 f"CROSSPROBE_SFDIR={SFDIR} — set CROSSPROBE_OUT to the "
                 "artifact for that tree; refusing to clobber committed evidence")
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

gate_bars = {}
PROBE_OUT = Path(sys.argv[2]) if len(sys.argv) > 2 else None
if PROBE_OUT is not None:
    probe_oracle = PROBE_OUT / "oracle_sql.json"
    if probe_oracle.exists():
        oracle.update(json.loads(probe_oracle.read_text()))
    probe_bars = PROBE_OUT / "gate_bars.json"
    if probe_bars.exists():
        gate_bars = json.loads(probe_bars.read_text())

# engine: Bench subset (min-of-3 warm passes at SFDIR).
# CROSSPROBE_BENCH_EXTRA: comma-separated query names ADDED to the
# Bench subset but not timed/reported — absorbers that restore the
# full suite's cost accounting inside a subset run. Bench charges
# shared per-pass evaluation state (the ANN exact ground truth,
# reset by resetEvalCaches each pass) to the alphabetically FIRST
# query that reads it; in the full inventory that is
# ann_binary_recall, so a subset containing a later recall gate
# (e.g. ann_ivfpq_recall) silently charges the shared ground-truth
# recompute to that gate ×3 passes, making its crossover row
# incomparable with the BENCH/BASELINE sf0.1 ratio it extends.
extra = __import__("os").environ.get("CROSSPROBE_BENCH_EXTRA", "")
bench_names = NAMES + [n for n in extra.split(",") if n and n not in NAMES]
env = dict(**__import__("os").environ,
           SPARK_GRAFT_SF_DIR=SFDIR, SPARK_GRAFT_CPUS="32",
           SPARK_GRAFT_ONLY=",".join(bench_names))
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
    is_gate = name in gate_bars
    sql = gatesql.gate_sql(name, gate_bars, oracle, PROBE_OUT) if is_gate \
        else oracle.get(name)
    if sql is None:
        print(f"skip {name}: no oracle sql")
        continue
    times = []
    for _ in range(3):
        t0 = time.time()
        res = con.execute(sql).fetchall()
        times.append(time.time() - t0)
    # a recall gate that does not HOLD at the probe SF must fail the
    # probe loudly, never be silently timed into the artifact
    if is_gate and res != [gatesql.EXPECTED_GATE_ROW]:
        sys.exit(f"{name}: gate recompute at the probe SF reads {res}, "
                 f"expected {[gatesql.EXPECTED_GATE_ROW]} — the gate does "
                 "not hold on this data; fix the gate before timing it")
    o = statistics.median(times)
    e = bench.get(name)
    result[name] = {"engine_s": round(e, 3) if e is not None else None,
                    "oracle_s": round(o, 3),
                    "ratio": round(e / o, 3) if e is not None else None,
                    # per-row provenance: merged artifacts accumulate rows
                    # measured at different trees, so the sha a row was
                    # actually timed at lives ON the row (the file-level
                    # git_sha is only the sha of the last WRITE; rows
                    # without this key predate r15 provenance stamping)
                    "git_sha": _head_sha()}
    if e is not None:
        print(f"{name}: engine {e}s vs oracle {o:.2f}s = {e / o:.2f}x")
    else:
        print(f"{name}: engine missing from bench subset; oracle {o:.2f}s")

sha = _head_sha()
out_path = REPO / OUT_NAME
merged = {}
if out_path.exists():
    # MERGE into an existing artifact (round 15): 100x probes are run
    # row-by-row in idle windows, and each invocation must not drop
    # the rows timed before it
    prior = json.loads(out_path.read_text())
    if prior.get("sf") == SFDIR:
        merged = prior.get("queries", {})
merged.update(result)
out_path.write_text(json.dumps(
    {"sf": SFDIR, "git_sha": sha, "method":
     "engine min-of-3 warm (Bench subset) vs DuckDB median-of-3, same host",
     "bench_absorbers": [n for n in bench_names if n not in NAMES],
     "queries": merged}, indent=1) + "\n")
print(f"wrote {OUT_NAME}")
