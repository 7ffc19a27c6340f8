"""Query-side scaling workload: the SAME query batch over the SAME
committed artifact at a chosen parallelism level.

Complements tools/scaling_bench.py (build-side) for the north_rule's
two-cluster-size criterion: the artifact is built once per run with a
FIXED partition layout (identical bytes at every level), then a fixed
batch of BM25 queries — hot single terms, topical terms, and 2-term
conjunctions over the Zipf corpus — runs with only task concurrency
varying. Reports batch seconds and queries/sec.

Usage: python tools/query_scaling_bench.py <cpus> [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# hot global terms only: each query decodes + scores a large fraction
# of the corpus's postings, so the measurement captures the DATA-bound
# regime (rare-term queries are scheduler-latency-bound on local mode
# and belong to the latency table in BENCH.md, not the scaling one)
QUERIES = [
    "t1", "t2", "t3", "t4",
    "t1 t2", "t2 t3", "t1 t3", "t3 t4",
    "t1 t2 t3", "t2 t3 t4", "t1 t4", "t2 t4",
]


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import save_index
    from prosearch_spark.query.block_engine import BlockSearchEngine
    from prosearch_spark.session import get_spark

    n_parts = 32  # fixed at every level -> identical plan + artifact
    spark = get_spark("query-scaling", master=f"local[{cpus}]",
                      shuffle_partitions=n_parts)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # short docs: more docs per posting budget -> hot-term queries touch
    # hundreds of thousands of postings while the build stays quick
    docs = zipf_corpus(spark, n_docs=n_docs, min_len=20, max_len=60
                       ).repartition(n_parts).cache()
    docs.count()
    path = tempfile.mkdtemp(prefix="qscale_")
    t0 = time.perf_counter()
    art = save_index(spark, docs, path, text_col="content")
    build_sec = time.perf_counter() - t0
    blk = BlockSearchEngine(spark, art)

    blk.topk("t1 z3_1", 10).collect()  # warm codegen/broadcast caches

    # serial batch: per-query LATENCY (floor = job-launch overhead on
    # local mode, so this number barely moves with cores — reported
    # for honesty, not as the scaling metric)
    t0 = time.perf_counter()
    for q in QUERIES:
        blk.topk(q, 10).collect()
    serial_sec = time.perf_counter() - t0

    # concurrent batch: serving THROUGHPUT — 8 client threads submit
    # queries simultaneously, Spark's FIFO scheduler overlaps their
    # stages across the available cores. This is the number that must
    # scale with executor count on a real cluster.
    from concurrent.futures import ThreadPoolExecutor

    def run_one(q: str) -> None:
        blk.topk(q, 10).collect()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(run_one, QUERIES * 2))
    conc_sec = time.perf_counter() - t0
    n_conc = len(QUERIES) * 2

    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "serial_batch_sec": round(serial_sec, 2),
        "serial_qps": round(len(QUERIES) / serial_sec, 3),
        "concurrent_batch_sec": round(conc_sec, 2),
        "concurrent_qps": round(n_conc / conc_sec, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
