"""Mixed-grammar pruning at big-index scale — r2 verdict item 4's
measured evidence.

Builds the 800k-doc positional Zipf artifact (record:"position") and
runs the lenient mixed queries with return_stats=True: latency plus
blocks decoded vs total for (a) a term+phrase mixed query — term-clause
blocks pruned by the phrase's match-doc ranges — and (b) a term-only
lenient query, which delegates to the score-based WAND ladder.

Usage: python tools/mixed_bench.py [cpus] [n_docs]
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

    spark = get_spark("mixed-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = zipf_corpus(spark, n_docs=n_docs).cache()
    docs.count()

    out: dict = {"n_docs": n_docs, "cpus": cpus}
    path = tempfile.mkdtemp(prefix="prosearch_mixed_bench_")
    t0 = time.perf_counter()
    save_index(spark, docs, path, text_col="content", n_buckets=32,
               with_positions=True)
    out["positional_commit_sec"] = round(time.perf_counter() - t0, 2)

    blk = BlockSearchEngine(spark, IndexArtifact.load(spark, path))
    with query_mode(spark):
        for name, q in [
            ("mixed_term_phrase", 't9 "z3_1 z3_2"'),
            ("mixed_phrase_only", '"z3_1 z3_2"'),
            ("mixed_term_only", "t9 z5_1"),
        ]:
            t0 = time.perf_counter()
            r, st = blk.mixed_topk(q, 10, round_to=6, return_stats=True)
            r.collect()
            out[name + "_sec"] = round(time.perf_counter() - t0, 2)
            out[name + "_stats"] = st
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
