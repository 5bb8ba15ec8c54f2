#!/usr/bin/env python3
"""Build a 100x probe dir (tmp/sf10probe) that scales PIPELINE load
linearly, unlike the verbatim 10x replication in scaleprobe.py.

Verbatim replication is adversarial for near-dup operators: every doc
gains R-1 exact copies, so TRUE near-dup pair output (and LSH/simhash
candidate volume) grows R^2 — at 100x that measures output explosion,
not plan scaling. A real 100x corpus has 100x the docs at similar dup
DENSITY. This builder models that:

- documents: replica 0 is the original; replica i>0 interleaves a
  replica-unique slot token q{i}p{j} between every two tokens. Every
  3-gram and 5-gram shingle window then contains an inserted token, so
  cross-replica docs share ZERO shingles (no cross-replica jaccard /
  minhash / simhash candidates), while aligned docs WITHIN a replica
  keep their original near-dup and exact-dup structure (identical
  texts perturb identically). Result: dup structure per replica ==
  sf0.1's, corpus 100x -> candidate and output volume scale ~linearly.
  n_chars is recomputed; doc_id shifts by i*SHIFT (SHIFT % 20 == 0
  preserves the eval-holdout and sampling splits).
- embeddings: replica i multiplies every vector by a deterministic
  Rademacher +-1 sign pattern (seed i). Sign flips preserve norms and
  ALL within-replica dot products exactly, while cross-replica cosines
  concentrate near 0 (|cos| ~ 1/sqrt(64)) — the within-replica
  near-dup geometry repeats 100x and no cross-replica near-dups
  appear. vec_id shifts by i*SHIFT.
- events: event_id and user_id shift by i*SHIFT (100x users, constant
  events/user) and ts shifts by i*366 days, so replicas occupy
  disjoint time ranges: windowed aggs, sessionization and the
  range/interval joins grow linearly instead of stacking identical
  (user, ts) values (the documented 10x-probe artifact).
- lineitem/orders: join keys shift per replica; dims copy unchanged
  (how a larger TPC-H SF behaves).

Excluded from the 100x run (documented quadratic-by-design):
dedup_embedding_cosine and dedup_semantic_gate (exact O(n^2)
baselines), the ann recall gates (they re-run the brute-force ground
truth; ann_bruteforce_topk itself is linear and IS probed).
Round 9 removed two former exclusions by deriving their geometry from
the corpus count: dedup_semantic (was fixed k=8 cells, now k ~ sqrt(n)
via Similarity.semCentroids) and mm_hamming_neardup (was fixed 4x12-bit
bands, now flips to 8x16-bit bands over the full 128-bit md5 at
>65536 docs via Multimodal.hammingGeometry).

ROUND-9 100x RESULTS (48g heap, warm = repeat run in one session):

- mm_hamming_neardup    161-204s  WIDE 8x16 geometry, zero spills.
                                  ~Linear in trigram volume (~200x
                                  sf0.1's 0.58s at ~200x trigrams;
                                  the cost is ~500M per-trigram md5
                                  digests — the oracle-replayable
                                  signature contract — while the band
                                  self-join stays bounded at ~7.6
                                  docs/bucket, the quantity the old
                                  fixed geometry sent quadratic).
- dedup_semantic         2.7-3.2s warm after the one-time k=448 fit
                                  (sqrt(200k) cells; within-cell scan
                                  decisively sublinear — was the
                                  round-3 "5.0s at 10x, quadratic at
                                  fixed k=8" caveat row).
- ann_matryoshka_rerank  1.0s     prefix scan + candidate re-rank.
- etl_qa_extract_nonempty 7.2s    10M events, one groupBy(user).
- cur_quality_lr_fit     1.8s     3 GD steps x one partial-agg pass.
- q37_pagerank           0.74s    warm on cached edges (68s one-time
                                  edge build over 60M lineitem rows).

Usage:
  python tools/scaleprobe100.py           # build tmp/sf10probe
  SPARK_GRAFT_SF_DIR=$PWD/tmp/sf10probe sbt "runMain graft.Probe times <queries>"

RESULTS (warm run at 100x vs sf0.1 warm; note the interleaved tokens
DOUBLE each doc's length, so the dedup family is really processing
~200x sf0.1's shingle volume — per-shingle throughput is ~2x better
than the raw ratios below):

- dedup_exact        0.5s ->  11.8s  (~25x)
- dedup_incremental  0.5s ->   7.7s  (~17x)
- dedup_ngram_jaccard 4.4s -> 167s   (~40x; first run 263s)
- dedup_minhash_lsh  1.7s ->  87s    (~50x)
- dedup_simhash      1.1s ->  53s    (~47x)
- dedup_clusters     5.3s -> 277s    (~52x)
- cur_dup_ngram_frac 1.3s ->  16.4s  (~12x)

All sublinear in shingle volume, zero memory or disk failures at
48 GB heap (SPARK_DRIVER_MEM=48g — 1.5 GB per local[32] thread, the
realistic per-core executor allotment; the default 8 GB heap that
works through 10x is artificially small for a 100x single-box run).
This run is what motivated hashing the jaccard index keys
(xxhash64(shingle) instead of the gram string): with string keys the
df-window sort + checkpointed posting lists + self-join spilled past
the ~78 GB of free local disk; with 8-byte keys peak extra disk was
~20 GB and every query completed.

Text/curation at 100x (warm): text_token_count 2.0s,
text_fingerprint 2.5s, text_ngram_freq 8.9s, cur_decontaminate 13s
(exact set), _shuffle 8.0s, _bloom 7.0s, cur_keep_list 14.7s,
cur_pack 1.1s, cur_pii_redact 4.6s, cur_tfidf_topterms 9.2s,
cur_mix_sources 1.9s, cur_chunk 2.1s, cur_repetition 2.9s,
cur_sample_stratified 0.3s — the whole curation surface is ~4-15x
sf0.1 time at 100x docs (with 2x doc length): strongly sublinear,
nothing resident, nothing skew-bound.

ROUND-4 RE-RUN (same dataset recipe, post JIT-code-cache fix +
pointer-doubled clustering + bloom-prefiltered decontamination +
keep-list single-aggregation + static SSE parse; warm = 2nd run):

- dedup_clusters           151.7s  (was 277s)   # O(log d) rounds
- dedup_ngram_jaccard      58-72s  (was 167s)
- dedup_minhash_lsh          7.7s  (was  87s)
- cur_decontaminate_shuffle  7.6s  (was 8.0s)
- cur_decontaminate_bloom    5.6s  (was 7.0s)
- cur_keep_list              6.3s  (was 14.7s)
- etl_sse_parse              6.2s  (was 14.9s)
- etl_model_judge            0.8s  (new: failure-injected model stage)

The across-the-board factor beyond the targeted rewrites is the
ReservedCodeCacheSize=1g fix: the r3 100x numbers were measured
with the default 240 MB code cache, which exhausts mid-run on long
multi-query sessions and silently de-optimizes everything after.

Relational/ETL/ANN/streaming at 100x (warm): q1 1.4s over 60M
lineitem rows, q3 2.7s, q5 6.8s, q9 1.0s, q13 1.6s, q16 1.8s,
q17 0.5s, q21 2.9s, q22 0.5s, etl_flatten_json 2.6s, etl_sse_parse
14.9s (50M exploded SSE lines), etl_qa_extract 3.9s, etl_json_to_text
2.6s, ann_bruteforce 0.7s, ann_lsh 1.8s, ann_ivf 1.4s, ann_pq 10.6s
(the 94s first run is the one-time codebook fit over 200k vectors —
Lloyd's iterations are the index-BUILD cost, amortized across
queries), emb_quantize_int8 1.5s, mm 0.3-0.6s, stream family
0.8-7.9s. With per-replica time shifts (disjoint event ranges, the
honest model of a longer crawl), stream_interval_join is 1.1s and
q21 2.9s at 100x — confirming the superlinear 10x-probe entries for
those two were replica-stacking geometry, not plan defects.

ROUND-7 additions (warm 2nd run at 100x vs sf0.1 warm, 48g heap):

- q29_correlated     0.46s ->  3.5s  (~7.6x)  # decorrelated agg+join
- q30_grouping_sets  0.40s -> 12.9s  (~32x)   # Expand x3 over 100x fact
- q31_funnel         0.74s ->  2.8s  (~3.7x)  # user-keyed first-touch aggs
- cur_source_cap     0.30s ->  0.7s  (~2.3x)  # bounded-heap TopKIds path
                                              # (replaced the per-source
                                              # window rank this round)

All sublinear at 100x data, no spills, no stragglers — cur_source_cap
in particular confirms the TopKIds re-plan: per-source state is O(cap)
per task regardless of domain skew.

- etl_paged_qa         0.28s ->  0.2s  (constant: stub API size is
                                        fixed; the page-loop plumbing
                                        itself is corpus-independent)
- ann_incremental_topk 1.47s -> 23.2s  (~16x warm; first run 381s is
                                        the ONE-TIME scaled-k index
                                        fit, k=437 over 190k base
                                        vectors — amortized like
                                        ann_pq's codebook fit)

ann_incremental_topk is the round-7 re-plan datapoint: with the fixed
k=8 geometry the same probe ran >10 minutes on ~700M candidate pairs
(shard x 3/8 of base = quadratic); with k = sqrt(n) cells and the
janino-safe kernel assignment, candidates are O(shard * nprobe *
sqrt(n)) and the 100x run completes in 23s warm.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "sf10probe")
os.makedirs(DST, exist_ok=True)

R = 100
SHIFT = 10_000_000
DAY_NS = 86_400_000_000_000


def writer_for(path, schema):
    return pq.ParquetWriter(path, schema)


# ---- documents: per-replica slot-token interleave ----
t = pq.read_table(f"{SRC}/documents.parquet").select(
    ["doc_id", "text", "lang", "source", "n_chars"])
docs_tok = [s.split(" ") for s in t["text"].to_pylist()]
doc_ids = t["doc_id"].to_pylist()
langs, sources = t["lang"], t["source"]
max_len = max(len(d) for d in docs_tok)
schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                    ("lang", pa.string()), ("source", pa.string()),
                    ("n_chars", pa.int64())])
w = writer_for(f"{DST}/documents.parquet", schema)
for i in range(R):
    if i == 0:
        texts = t["text"].to_pylist()
    else:
        ins = [f"q{i}p{j}" for j in range(max_len)]
        texts = []
        for d in docs_tok:
            out = []
            for j, tok in enumerate(d):
                out.append(tok)
                if j < len(d) - 1:
                    out.append(ins[j])
            texts.append(" ".join(out))
    w.write_table(pa.table({
        "doc_id": pa.array([x + i * SHIFT for x in doc_ids], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": langs, "source": sources,
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    }, schema=schema))
w.close()
print("documents", len(doc_ids) * R, "rows ->", DST)

# ---- embeddings: per-replica Rademacher sign flip ----
t = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
vids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
labels = t["label"]
dim = vecs.shape[1]
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
w = writer_for(f"{DST}/embeddings.parquet", schema)
for i in range(R):
    signs = np.where(np.random.RandomState(i).rand(dim) < 0.5, -1.0, 1.0
                     ).astype(np.float32) if i else np.ones(dim, np.float32)
    flipped = vecs * signs
    w.write_table(pa.table({
        "vec_id": pa.array(vids + i * SHIFT),
        "embedding": pa.array(list(flipped), pa.list_(pa.float32())),
        "label": labels,
    }, schema=schema))
w.close()
print("embeddings", len(vids) * R, "rows ->", DST)

# ---- events: shift ids, users and TIME (disjoint ranges per replica) ----
t = pq.read_table(f"{SRC}/events.parquet")
ts_ns = pc.cast(t["ts"], pa.int64())
schema = t.schema
w = writer_for(f"{DST}/events.parquet", schema)
for i in range(R):
    w.write_table(pa.table({
        "event_id": pc.add(t["event_id"], i * SHIFT),
        "ts": pc.cast(pc.add(ts_ns, i * 366 * DAY_NS), t.schema.field("ts").type),
        "user_id": pc.add(t["user_id"], i * SHIFT),
        "event_type": t["event_type"], "value": t["value"], "props": t["props"],
    }, schema=schema))
w.close()
print("events", t.num_rows * R, "rows ->", DST)

# ---- lineitem / orders: shift join keys only ----
for name, keys in [("lineitem", ["l_orderkey"]), ("orders", ["o_orderkey"])]:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    w = writer_for(f"{DST}/{name}.parquet", t.schema)
    for i in range(R):
        cols = {c: (pc.add(t[c], i * SHIFT) if c in keys else t[c])
                for c in t.column_names}
        w.write_table(pa.table(cols, schema=t.schema))
    w.close()
    print(name, t.num_rows * R, "rows ->", DST)

for name in ["region", "nation", "customer", "supplier", "part"]:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(name, t.num_rows, "rows (dim, unreplicated) ->", DST)
