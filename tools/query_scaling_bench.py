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


QUERIES = [
    "t1", "t2", "t3", "z1_1", "z3_1", "z5_1", "z7_1", "z11_1",
    "t1 t2", "t2 t3", "z3_1 z3_2", "z7_1 z7_2",
    "t1 z3_1", "t4 t5", "z9_1", "t1 t2 t3",
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

    docs = zipf_corpus(spark, n_docs=n_docs).repartition(n_parts).cache()
    docs.count()
    path = tempfile.mkdtemp(prefix="qscale_")
    t0 = time.perf_counter()
    art = save_index(spark, docs, path, text_col="content")
    build_sec = time.perf_counter() - t0
    blk = BlockSearchEngine(spark, art)

    blk.topk("t1 z3_1", 10).collect()  # warm codegen/broadcast caches

    t0 = time.perf_counter()
    for q in QUERIES:
        blk.topk(q, 10).collect()
    batch_sec = time.perf_counter() - t0

    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "query_batch_sec": round(batch_sec, 2),
        "queries": len(QUERIES),
        "queries_per_sec": round(len(QUERIES) / batch_sec, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
