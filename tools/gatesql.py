"""Shared DuckDB recompute of an `ann_*_recall` gate.

The committed correctness oracles for the recall gates are
constant-probe SELECTs (the gate values are deterministic constants
the driver hash-compares), so TIMING them measures none of the gate's
work. Both tools/baseline.py and tools/crossprobe.py therefore time
DuckDB recomputing the gate for real — exact brute-force ground-truth
top-k over the embeddings plus the rank / hit-count /
candidate-volume aggregation over the gate's dumped candidate set —
and both must use the SAME definition: a bar / topk / query-count
edit applied to one copy but not the other would make the 10x
crossover rows certify a different gate than the baseline does. The
expected result is validated by callers against EXPECTED_GATE_ROW
(the gates are self-checking; a recompute that does not read
(n_queries, 1, 1) means the gate does NOT hold on that data and must
fail the tool loudly, never be silently timed).
"""

# every gate row asserts exactly this (10 query vectors, both flags
# green); the 10 mirrors Similarity.NumQueryVecs
EXPECTED_GATE_ROW = (10, 1, 1)


def gate_sql(name: str, gate_bars: dict, oracle: dict, outdir) -> str:
    """Real-work equivalent of an ann_*_recall gate: exact ground
    truth (the committed ann_bruteforce_topk oracle — or the gate's
    own gt_oracle for label-restricted gates — the dominant cost) +
    rank/hit/volume aggregation over the candidate set dumped by
    graft.Verify at the SAME scale factor as `outdir`."""
    bars = gate_bars[name]
    k, rbar, pbar = bars["topk"], bars["recall_bar"], bars["prune_bar"]
    gt = oracle[bars.get("gt_oracle", "ann_bruteforce_topk")].rstrip().rstrip(";")
    cand = outdir / f"{name}_cand"
    return f"""
WITH gt AS ({gt}),
cand AS (SELECT * FROM read_parquet('{cand}/*.parquet')),
ranked AS (SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk,
    count(*) OVER (PARTITION BY query_id) AS n_cand
  FROM cand),
hits AS (SELECT count(*) AS n_hit
  FROM ranked r JOIN gt g USING (query_id, neighbor_id) WHERE r.rk <= {k}),
vol AS (SELECT max(n_cand) AS max_cand FROM ranked),
corpus AS (SELECT count(*) AS n_total,
    sum(CASE WHEN vec_id < 10 THEN 1 ELSE 0 END) AS n_queries
  FROM embeddings)
SELECT CAST(n_queries AS BIGINT) AS n_queries,
  CAST(n_hit >= n_queries * {k} * {rbar} AS BIGINT) AS recall_ok,
  CAST(max_cand <= n_total * {pbar} AS BIGINT) AS prune_ok
FROM corpus, hits, vol"""
