#!/usr/bin/env python3
"""Build a 10x-replicated documents/embeddings dir for scale probing.

Replicates /root/testdata/sf0.1 documents+embeddings 10x with shifted
ids into tmp/sf1probe (inside the repo; regenerable, not committed).
Run the dedup/ANN/curation families against it via:

  SPARK_GRAFT_SF_DIR=$PWD/tmp/sf1probe sbt "runMain graft.Probe times dedup_ngram_jaccard ..."

Round-3 results (50k docs / 20k vectors, local[32]): every dedup, ANN
and curation query completed with no memory failures; scaling was
linear or better (the DF cap prunes harder as document frequencies
grow), except the intentionally-exact dedup_embedding_cosine whose
O(n^2) block-pair scan showed its documented quadratic compute
(1.2s -> 25s) while remaining memory-safe.

Re-run after the late-round rewrites (count-based jaccard verify,
post-sort projection, checkpoint barriers) — warm times at 10x data
vs sf0.1: dedup_ngram_jaccard 3.3s->8.9s (2.7x), dedup_clusters
4.3s->6.8s (1.6x), dedup_minhash_lsh 1.5s->7.0s, dedup_simhash
1.7s->4.9s, cur_tfidf_topterms 1.1s->1.8s, cur_keep_list 1.6s->5.2s,
cur_pii_redact 0.9s->1.9s, cur_pack 0.4s->0.7s; ANN family 1.5-3.1s.
All sublinear-or-linear; the exact cosine baseline stays quadratic
by design (24s).
"""
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "sf1probe")
os.makedirs(DST, exist_ok=True)

for name, idcol in [("documents", "doc_id"), ("embeddings", "vec_id")]:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(10):
        ids = pc.add(t[idcol], i * 10_000_000)
        cols = {c: (ids if c == idcol else t[c]) for c in t.column_names}
        parts.append(pa.table(cols))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{DST}/{name}.parquet")
    print(name, len(big), "rows ->", DST)
