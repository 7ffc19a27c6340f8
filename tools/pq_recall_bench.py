"""PQ recall as a function of the TRAINING-SAMPLE size pq_k (r6
verdict item 7): codebooks are unit subvectors of the pq_k smallest
ids — the BENCH §2h''' pattern evidenced the ``candidates`` knob, this
evidences the ``pq_k`` knob the same way, on the same clustered
synthetic corpus (topic direction + 30% hash noise).

For each pq_k in the list, commit an IVF+PQ store, run pq_topk at a
fixed candidate depth, and report recall@k against the exact brute
cosine top-k.

Usage: python tools/pq_recall_bench.py [n_vectors] [candidates]
       (defaults 200000 800). Prints one JSON line.
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
    cands = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    dim, n_topics, n_cent, n_probe, k = 64, 32, 64, 4, 10
    # pq_k=256 is NOT in the default list: the commit-time flat
    # assignment expression is m*pq_k codeword l2 chains, and at 256
    # codewords the ~16k-term Catalyst tree thrashes driver GC before
    # codegen even compiles — the training-sample knob is bounded by
    # the assignment architecture, which is part of the finding.
    pq_ks = ([int(x) for x in sys.argv[3].split(",")]
             if len(sys.argv) > 3 else [16, 64, 128])

    from pyspark.sql import functions as F

    from prosearch_spark.index.vectors import save_vector_index
    from prosearch_spark.ops.similarity import cosine_topk
    from prosearch_spark.session import get_spark

    spark = get_spark("pq-recall-bench")
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
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 12345).head()["embedding"]]
    brute_ids = [r["vec_id"] for r in
                 cosine_topk(emb, qvec, k, round_to=6).collect()]

    rows = []
    for pq_k in pq_ks:
        t0 = time.perf_counter()
        va = save_vector_index(
            spark, emb, tempfile.mkdtemp(prefix=f"pqk{pq_k}_"),
            n_centroids=n_cent, pq_m=8, pq_k=pq_k)
        commit_s = time.perf_counter() - t0
        got = [r["vec_id"] for r in
               va.pq_topk(qvec, k, n_probe=n_probe, candidates=cands,
                          round_to=6).collect()]
        rows.append({
            "pq_k": pq_k,
            "commit_sec": round(commit_s, 3),
            "recall_at_k": round(len(set(brute_ids) & set(got)) / k, 3),
        })

    print(json.dumps({
        "metric": "pq_recall_vs_pq_k",
        "n_vectors": n, "dim": dim, "pq_m": 8,
        "n_centroids": n_cent, "n_probe": n_probe,
        "candidates": cands, "k": k,
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
