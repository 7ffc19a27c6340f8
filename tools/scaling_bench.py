"""Scaling-efficiency workload: the SAME index-build job at a chosen
parallelism level, on the SAME deterministic input.

The north_rule's two-cluster-size criterion (N vs 4N executors,
efficiency >= 0.8) is evidenced in this sandbox by running this script
at two local[] parallelism levels (driver instruction). The workload
is CPU-bound distributed work — tokenize -> explode -> two-phase
aggregation -> block encode — on a synthetic corpus large enough that
fixed JVM/session overhead is amortized.

Usage: python tools/scaling_bench.py <cpus> [n_docs]
Prints one JSON line with build seconds + files/sec + postings/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from prosearch_spark.corpus import synth_corpus
    from prosearch_spark.index.blocks import encode_blocks
    from prosearch_spark.index.build import build_index
    from prosearch_spark.session import get_spark

    # IDENTICAL physical plan at every parallelism level: fixed 64
    # partitions everywhere, so only task *concurrency* varies between
    # runs — the sandbox analog of the same job on N vs 4N executors.
    n_parts = 64
    spark = get_spark("scaling-bench", master=f"local[{cpus}]",
                      shuffle_partitions=n_parts)
    spark.sparkContext.setLogLevel("ERROR")
    # AQE coalescing would change partitioning per level; disable for
    # the controlled comparison
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # deterministic distributed input; materialize OUTSIDE the timed
    # window so we time the build, not the generator
    docs = synth_corpus(spark, n_docs=n_docs, n_repos=64, seed=42,
                        dense_ids=False).repartition(n_parts).cache()
    docs.count()

    from pyspark.sql import functions as F

    def one_pass():
        idx = build_index(docs, text_col="content", analyzer="code")
        # persist postings: encode's range partitioner runs a sampling
        # job over its input — without materialization that job would
        # re-tokenize the whole corpus (the 100 TB analog is writing
        # postings to storage between the two stages, as the lineage
        # builder does)
        p = idx.postings.persist()
        blocks = encode_blocks(p, num_partitions=n_parts)
        a = blocks.agg(F.count("*").alias("b"), F.sum("n").alias("p")).collect()[0]
        p.unpersist()
        return int(a["b"]), int(a["p"])

    one_pass()  # warm-up: JIT + codegen compile, not part of the measure
    t0 = time.perf_counter()
    n_blocks, n_postings = one_pass()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_blocks": n_blocks,
        "build_sec": round(wall, 3),
        "files_per_sec": round(n_docs / wall, 2),
        "postings_per_sec": round(n_postings / wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
