"""Batched vs sequential MoreLikeThis over the committed artifact.

The related-docs twin of §2f/§2f'': a result page of B seeds served
as B sequential `block_engine.more_like_this` calls (each = doc-store
fetch + selection + WAND(k+1)) vs ONE `multi_more_like_this` batch
(one doc-store fetch, one per-seed selection window, one decode +
disjunctive batch rank — three jobs regardless of B). Per-seed
results share the oracle (msearch_mlt/_blocks gate entries), so the
comparison is pure cost. The sequential side serves each seed with
the short-circuit plan (min_prune_blocks default) — its best case.

Usage: python tools/mlt_bench.py [n_docs] [batch]
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
    k = 10

    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import save_index
    from prosearch_spark.query.block_engine import BlockSearchEngine
    from prosearch_spark.session import get_spark, query_mode

    spark = get_spark("mlt-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = zipf_corpus(spark, n_docs=n, seed=42)
    root = tempfile.mkdtemp(prefix="mltbench_")
    art = save_index(spark, docs, root, text_col="content")
    art.write_doc_store(docs, ["content"])
    be = BlockSearchEngine(spark, art)
    seeds = [7 + 13 * i for i in range(batch)]

    def run_seq() -> float:
        t = time.perf_counter()
        for s in seeds:
            hits, _st = be.more_like_this(s, k, max_terms=8, min_df=2,
                                          round_to=6,
                                          text_col="content")
            hits.collect()
        return time.perf_counter() - t

    def run_batch() -> float:
        t = time.perf_counter()
        be.multi_more_like_this(seeds, k, max_terms=8, min_df=2,
                                round_to=6,
                                text_col="content").collect()
        return time.perf_counter() - t

    with query_mode(spark):
        run_batch()  # warm
        b1 = run_batch()
        s1 = run_seq()
        b2 = run_batch()
    batch_s, seq_s = min(b1, b2), s1

    print(json.dumps({
        "metric": "mlt_msearch_amortization",
        "n_docs": n, "batch": batch,
        "sequential_sec": round(seq_s, 3),
        "batched_sec": round(batch_s, 3),
        "speedup": round(seq_s / batch_s, 2) if batch_s else None,
        "seq_sec_per_seed": round(seq_s / batch, 3),
        "batch_sec_per_seed": round(batch_s / batch, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
