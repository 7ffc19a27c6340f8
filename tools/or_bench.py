"""Disjunctive Block-Max WAND at big-index scale.

Builds the 800k-doc Zipf artifact and runs topical disjunctions
through topk_wand_or with the full ladder forced (min_prune_blocks=0):
latency + blocks decoded vs total, against the unpruned flat
disjunction over the same artifact — the measured case that the
per-block bound self-range-join pays for itself on a long-tail
vocabulary (the Ding & Suel 2011 setting).

Usage: python tools/or_bench.py [cpus] [n_docs]
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
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000

    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import IndexArtifact, save_index
    from prosearch_spark.query.block_engine import BlockSearchEngine
    from prosearch_spark.session import get_spark, query_mode

    spark = get_spark("or-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = zipf_corpus(spark, n_docs=n_docs).cache()
    docs.count()

    out: dict = {"n_docs": n_docs, "cpus": cpus}
    path = tempfile.mkdtemp(prefix="prosearch_or_bench_")
    t0 = time.perf_counter()
    save_index(spark, docs, path, text_col="content", n_buckets=32)
    out["commit_sec"] = round(time.perf_counter() - t0, 2)

    blk = BlockSearchEngine(spark, IndexArtifact.load(spark, path))
    with query_mode(spark):
        for name, q in [
            ("or_two_topical", "z3_1 z3_2"),
            ("or_topical_plus_tail", "z3_1 z5_1"),
            ("or_three", "z3_1 z3_2 z5_1"),
        ]:
            t0 = time.perf_counter()
            r, st = blk.topk_wand_or(q, 10, round_to=6,
                                     min_prune_blocks=0)
            r.collect()
            out[name + "_wand_sec"] = round(time.perf_counter() - t0, 2)
            out[name + "_stats"] = st
            t0 = time.perf_counter()
            blk._engine(q).topk_or(q, 10, round_to=6).collect()
            out[name + "_unpruned_sec"] = round(
                time.perf_counter() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
