"""Committed-IVF wall-clock evidence: brute scan vs partition-pruned probe.

BENCH.md §2h pins the vector artifact's partition pruning structurally
(PartitionFilters in the plan) because the 8k-vector gate table fits in
one task either way. This script measures the same comparison at a
size where pruning is visible: N topic-structured synthetic vectors
(deterministic hash noise around one of T topic directions — the
clustered shape real embedding corpora have), committed as an IVF
store with C coarse buckets, then

- brute: exact cosine top-k over the full store (one scan);
- probed: VectorArtifact.topk with n_probe buckets (the scan opens
  only the probed bucket DIRECTORIES);

reporting wall seconds for both (min of 2 warm runs), the fraction of
the store the probe reads, and recall@k of probed vs brute — the
speed/recall trade the n_probe knob buys at any scale.

Usage: python tools/vector_bench.py [n_vectors] [dim] [n_centroids]
       [n_probe] [lloyd]   (defaults 200000 64 64 4). A 5th arg
       "lloyd" trains the quantizer with train_centroids_lloyd (the
       non-gated quality path) instead of the sampled-member rule —
       compare `largest_bucket_fraction` and recall between the two.
       Prints one JSON line.
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
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cent = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_probe = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    n_topics = 32
    k = 10

    from pyspark.sql import functions as F

    from prosearch_spark.index.vectors import VectorArtifact, save_vector_index
    from prosearch_spark.ops.similarity import cosine_topk
    from prosearch_spark.session import get_spark

    spark = get_spark("vector-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic clustered vectors: topic direction + 30% hash noise
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

    lloyd = len(sys.argv) > 5 and sys.argv[5] == "lloyd"
    root = tempfile.mkdtemp(prefix="vecbench_")
    t0 = time.perf_counter()
    cents = None
    if lloyd:
        from prosearch_spark.index.vectors import train_centroids_lloyd

        cents = train_centroids_lloyd(emb, n_cent, n_iters=5)
    va = save_vector_index(spark, emb, root, n_centroids=n_cent,
                           centroids=cents, pq_m=8, pq_k=16)
    commit_s = time.perf_counter() - t0

    qvec = [float(x) for x in
            va.vectors().filter(F.col("vec_id") == 12345)
            .head()["embedding"]]

    def run_brute() -> tuple[float, list[int]]:
        t = time.perf_counter()
        rows = cosine_topk(va.vectors(), qvec, k, round_to=6).collect()
        return time.perf_counter() - t, [r["vec_id"] for r in rows]

    def run_probe() -> tuple[float, list[int]]:
        t = time.perf_counter()
        rows = va.topk(qvec, k, n_probe=n_probe).collect()
        return time.perf_counter() - t, [r["vec_id"] for r in rows]

    def run_sq() -> tuple[float, list[int]]:
        # SQ-within-IVF (round 6): same probe prune, but the candidate
        # pass projects ONLY the 1-byte code column (dim bytes/vec vs
        # 4*dim for float32 — the two levers multiply), then re-reads
        # just the winners' embeddings for the exact re-rank
        t = time.perf_counter()
        rows = va.sq_topk(qvec, k, n_probe=n_probe, candidates=4 * k,
                          round_to=6).collect()
        return time.perf_counter() - t, [r["vec_id"] for r in rows]

    # PQ candidate depth is the FAISS k_factor knob: ~0.4% of the
    # store (measured recall@10 0.2 at 4*k vs 1.0 at this depth on
    # this corpus — ADC separates regions, the exact re-rank does
    # the rest; see pq_topk's docstring)
    pq_cands = max(4 * k, n // 250)

    def run_pq() -> tuple[float, list[int]]:
        # PQ-within-IVF (round 6 late): the candidate pass reads only
        # m smallint codeword indexes per vector (2m bytes vs 4*dim
        # float32 — 16x at m=8/dim=64) and scores via the ADC lookup
        # chain; exact re-rank on the winners
        t = time.perf_counter()
        rows = va.pq_topk(qvec, k, n_probe=n_probe, candidates=pq_cands,
                          round_to=6).collect()
        return time.perf_counter() - t, [r["vec_id"] for r in rows]

    run_brute(); run_probe(); run_sq(); run_pq()  # warm (codegen + cache)
    (b1, brute_ids), (p1, probe_ids) = run_brute(), run_probe()
    (s1, sq_ids) = run_sq()
    (pq1, pq_ids) = run_pq()
    b2, _ = run_brute()
    p2, _ = run_probe()
    s2, _ = run_sq()
    pq2, _ = run_pq()
    brute_s, probe_s, sq_s = min(b1, b2), min(p1, p2), min(s1, s2)
    pq_s = min(pq1, pq2)

    probed = va.probe_buckets(qvec, n_probe)
    n_read = va.vectors().filter(F.col("bucket").isin(probed)).count()
    largest = max(r["n"] for r in va.vectors().groupBy("bucket")
                  .agg(F.count("*").alias("n")).collect())

    print(json.dumps({
        "metric": "ivf_partition_pruning",
        "quantizer": "lloyd" if lloyd else "sampled",
        "largest_bucket_fraction": round(largest / n, 4),
        "n_vectors": n, "dim": dim, "n_centroids": n_cent,
        "n_probe": n_probe,
        "commit_sec": round(commit_s, 3),
        "brute_topk_sec": round(brute_s, 3),
        "probed_topk_sec": round(probe_s, 3),
        "sq_ivf_topk_sec": round(sq_s, 3),
        "pq_ivf_topk_sec": round(pq_s, 3),
        "speedup": round(brute_s / probe_s, 2) if probe_s else None,
        "sq_speedup_vs_brute": round(brute_s / sq_s, 2) if sq_s else None,
        "pq_speedup_vs_brute": round(brute_s / pq_s, 2) if pq_s else None,
        "store_fraction_read": round(n_read / n, 4),
        # the candidate pass's per-vector scan bytes: probed buckets x
        # 1-byte SQ codes / 2-byte-per-subspace PQ indexes vs the full
        # store x 4-byte floats
        "candidate_bytes_per_vec": {
            "sq_code": dim,
            "pq_code": 2 * (va.manifest.get("pq") or {}).get("m", 0),
            "float32": 4 * dim},
        "recall_at_k": round(
            len(set(brute_ids) & set(probe_ids)) / k, 3),
        "sq_recall_at_k": round(
            len(set(brute_ids) & set(sq_ids)) / k, 3),
        "pq_recall_at_k": round(
            len(set(brute_ids) & set(pq_ids)) / k, 3),
        "pq_candidates": pq_cands,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
