"""Batched vs sequential query serving — the msearch amortization.

A Spark job carries a fixed scheduling cost, so serving N queries as N
sequential ``topk`` jobs pays it N times over the same postings scan.
``multi_topk`` batches the whole query list into ONE job (one
bucket/term-pruned decode, one shuffle, a partitioned-window rank).
This tool measures both paths over a committed Zipf artifact and
asserts they return byte-identical hits before reporting.

Usage: python tools/msearch_bench.py [cpus] [n_docs] [n_queries]
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
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import save_index
    from prosearch_spark.query.block_engine import BlockSearchEngine
    from prosearch_spark.session import get_spark, query_mode

    spark = get_spark("msearch-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = zipf_corpus(spark, n_docs=n_docs).cache()
    docs.count()
    path = tempfile.mkdtemp(prefix="prosearch_msearch_bench_")
    art = save_index(spark, docs, path, text_col="content")
    blk = BlockSearchEngine(spark, art)

    # deterministic query mix: topic singles + 2-term ANDs across the
    # Zipf topic vocabulary (every query hits a different hot region)
    queries = []
    for i in range(n_queries):
        t = i % 16
        if i % 2 == 0:
            queries.append(f"z{t}_1")
        else:
            queries.append(f"z{t}_1 z{t}_2")

    out: dict = {"n_docs": n_docs, "cpus": cpus, "n_queries": n_queries}
    with query_mode(spark):
        blk.topk(queries[0], 10, round_to=6).collect()  # warm caches

        t0 = time.perf_counter()
        seq = {}
        for qi, q in enumerate(queries):
            seq[qi] = [(r["rank"], r["doc_id"], r["score"])
                       for r in blk.topk(q, 10, round_to=6).collect()]
        out["sequential_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        rows = blk.multi_topk(queries, 10, round_to=6).collect()
        out["batched_sec"] = round(time.perf_counter() - t0, 2)

    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    mismatch = [qi for qi in range(len(queries))
                if got.get(qi, []) != seq.get(qi, [])]
    out["mismatched_queries"] = mismatch  # must be []
    out["sequential_qps"] = round(n_queries / out["sequential_sec"], 2)
    out["batched_qps"] = round(n_queries / out["batched_sec"], 2)
    out["speedup"] = round(out["sequential_sec"] / out["batched_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
