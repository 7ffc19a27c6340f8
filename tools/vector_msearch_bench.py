"""Batched vs sequential ANN serving over the committed IVF store.

§2f measured the lexical msearch amortization claim; this is the
vector twin. A Spark job carries a fixed scheduling cost, so serving
B query vectors as B sequential `VectorArtifact.topk` calls pays that
cost B times; `multi_topk` runs the whole batch as ONE job — a single
scan of the UNION of probed bucket directories, a broadcast
(query_id, bucket) probe-map equi-join, and a partitioned-window
per-query rank. Per-query results are identical (pinned in
tests/test_round6.py), so the comparison is pure cost.

Usage: python tools/vector_msearch_bench.py [n_vectors] [batch]
       (defaults 200000 32). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dim, n_topics, n_cent, n_probe, k = 64, 32, 64, 4, 10

    from pyspark.sql import functions as F

    from prosearch_spark.index.vectors import save_vector_index
    from prosearch_spark.session import get_spark

    spark = get_spark("vector-msearch-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def _h(a, b):
        return (F.hash(a, b) % 1000) / 1000.0

    js = F.sequence(F.lit(0), F.lit(dim - 1))
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            js,
            lambda j: _h((F.col("id") % n_topics) + 1_000_000, j)
            + F.lit(0.3) * _h(F.col("id"), j),
        ).alias("embedding"),
    )
    va = save_vector_index(spark, emb.filter(F.col("vec_id") >= batch),
                           tempfile.mkdtemp(prefix="vmsearch_"),
                           n_centroids=n_cent)
    qs = emb.filter(F.col("vec_id") < batch).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv")).cache()
    qvecs = [(r["query_id"], [float(x) for x in r["qv"]])
             for r in qs.collect()]

    def run_seq() -> float:
        t = time.perf_counter()
        for _qid, qv in qvecs:
            va.topk(qv, k, n_probe=n_probe, round_to=6).collect()
        return time.perf_counter() - t

    def run_batch() -> float:
        t = time.perf_counter()
        va.multi_topk(qs, k, n_probe=n_probe, round_to=6).collect()
        return time.perf_counter() - t

    # r7 (r6 verdict item 6): the SQ-code batch — the candidate pass
    # reads the 1-byte code column of the probed union ONCE for the
    # whole batch (dim bytes/vec vs 8*dim for the float64 embeddings
    # multi_topk scans), then re-ranks only the winners exactly
    def run_seq_sq() -> float:
        t = time.perf_counter()
        for _qid, qv in qvecs:
            va.sq_topk(qv, k, n_probe=n_probe, candidates=4 * k,
                       round_to=6).collect()
        return time.perf_counter() - t

    def run_batch_sq() -> float:
        t = time.perf_counter()
        va.multi_sq_topk(qs, k, n_probe=n_probe, candidates=4 * k,
                         round_to=6).collect()
        return time.perf_counter() - t

    run_batch(); run_batch_sq()  # warm (codegen + page cache)
    b1, s1 = run_batch(), run_seq()
    q1, sq1 = run_batch_sq(), run_seq_sq()
    b2, q2 = run_batch(), run_batch_sq()
    batch_s, seq_s = min(b1, b2), s1
    batch_sq_s, seq_sq_s = min(q1, q2), sq1

    print(json.dumps({
        "metric": "vector_msearch_amortization",
        "n_vectors": n, "batch": batch, "n_centroids": n_cent,
        "n_probe": n_probe,
        "sequential_sec": round(seq_s, 3),
        "batched_sec": round(batch_s, 3),
        "speedup": round(seq_s / batch_s, 2) if batch_s else None,
        "seq_ms_per_query": round(1000 * seq_s / batch, 1),
        "batch_ms_per_query": round(1000 * batch_s / batch, 1),
        "sq_sequential_sec": round(seq_sq_s, 3),
        "sq_batched_sec": round(batch_sq_s, 3),
        "sq_speedup": round(seq_sq_s / batch_sq_s, 2)
        if batch_sq_s else None,
        "candidate_bytes_per_vec": {"sq_code": dim, "float64": 8 * dim},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
