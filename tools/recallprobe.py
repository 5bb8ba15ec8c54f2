#!/usr/bin/env python3
"""10x recall-gate pin (VERDICT r11 item 9).

Run every ANN recall/quality gate at the 10x-replicated
tmp/sf1probe corpus (build with tools/scaleprobe.py if absent) and
record the gate rows verbatim to recallgates_10x.json. The gates are
self-checking (recall_ok / prune_ok / work_ok flags computed against
the exact ground truth at THIS scale), so a quantizer-geometry
regression — k not tracking sqrt(n), collapsed cells, stale-centroid
drift — flips a flag here before any scale-up, not after.

Usage: python tools/recallprobe.py
"""
import json
import subprocess
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).parent.parent
SFDIR = str(REPO / "tmp" / "sf1probe")
OUT = Path("/tmp/recallprobe_out")
GATES = [
    "ann_lsh_recall", "ann_multiprobe_recall", "ann_ivf_recall",
    "ann_pq_recall", "ann_ivfpq_recall", "ann_filtered_ivfpq_recall",
    "ann_binary_recall", "ann_upsert_recall", "ann_matryoshka_rerank",
    "dedup_semantic_gate",
]

if not Path(SFDIR).exists():
    sys.exit("build tmp/sf1probe first (tools/scaleprobe.py)")

r = subprocess.run(
    ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT} {",".join(GATES)}'],
    cwd=REPO, capture_output=True, text=True)
if r.returncode != 0:
    print(r.stdout[-4000:])
    sys.exit("verify run failed")

rows = {}
ok = True
for g in GATES:
    p = OUT / g
    if not p.exists():
        rows[g] = {"err": "missing"}
        ok = False
        continue
    df = pd.read_parquet(p)
    rec = df.to_dict(orient="records")
    rows[g] = rec[0] if len(rec) == 1 else {"n_rows": len(rec)}
    for flag in ("recall_ok", "prune_ok", "work_ok"):
        if flag in df.columns and not bool((df[flag] == 1).all()):
            ok = False
            rows[g]["FAILED"] = flag

sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                     capture_output=True, text=True).stdout.strip()


def jsonable(v):
    try:
        return v.item()
    except AttributeError:
        return v


(REPO / "recallgates_10x.json").write_text(json.dumps(
    {"sf": SFDIR, "git_sha": sha, "all_gates_green": ok,
     "gates": {k: {c: jsonable(x) for c, x in v.items()}
               for k, v in rows.items()}}, indent=1) + "\n")
print(("ALL GREEN" if ok else "GATE FAILURE") + " -> recallgates_10x.json")
for k, v in rows.items():
    print(f"  {k}: {v}")
sys.exit(0 if ok else 1)
