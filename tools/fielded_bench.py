"""Fielded (title+body) path at big-index scale — r2 verdict item 8.

Builds the dual per-field artifact (title record:basic, body true-tf)
over an 800k-doc Zipf corpus (title = first 4 content tokens, the same
derivation the gate entries use) and measures:

- fielded dual-artifact commit wall seconds,
- fielded top-10 latency (single term + 2-term AND) through the
  unpruned block path,
- fielded Block-Max WAND latency + blocks decoded/total, once with the
  default cost cutoff (the serving configuration) and once with the
  ladder forced (min_prune_blocks=0, the pruning measurement).

Round 4 additions (the body field commits record:"position", the
reference's actual schema): fielded lenient MIXED query latency
(term + quoted phrase, phrases scoring body-only), and the fielded
disjunctive WAND ladder forced, with its pruning stats.

Usage: python tools/fielded_bench.py [cpus] [n_docs]
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

    from pyspark.sql import functions as F

    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import (
        load_fielded_index,
        save_fielded_index,
    )
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine
    from prosearch_spark.session import get_spark, query_mode

    spark = get_spark("fielded-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = zipf_corpus(spark, n_docs=n_docs).withColumn(
        "title", F.concat_ws(" ", F.slice(F.split("content", " "), 1, 4))
    ).cache()
    docs.count()

    out: dict = {"n_docs": n_docs, "cpus": cpus}
    path = tempfile.mkdtemp(prefix="prosearch_fielded_bench_")
    t0 = time.perf_counter()
    save_fielded_index(spark, docs, path,
                       {"title": "title", "body": "content"},
                       positional_fields=frozenset({"body"}),
                       n_buckets=32)
    out["fielded_commit_sec"] = round(time.perf_counter() - t0, 2)

    blk = FieldedBlockSearchEngine(spark, load_fielded_index(spark, path))
    with query_mode(spark):
        for name, q in [("q_fielded_single", "z3_1"),
                        ("q_fielded_and2", "z3_1 z3_2")]:
            t0 = time.perf_counter()
            blk.topk(q, 10, round_to=6).collect()
            out[name] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        r, st = blk.topk_wand("z3_1", 10, round_to=6)
        r.collect()
        out["q_fielded_wand_default"] = round(time.perf_counter() - t0, 2)
        out["wand_default_stats"] = st
        t0 = time.perf_counter()
        r, st = blk.topk_wand("z3_1", 10, round_to=6, min_prune_blocks=0)
        r.collect()
        out["q_fielded_wand_ladder"] = round(time.perf_counter() - t0, 2)
        out["wand_ladder_stats"] = st
        # round 4: quoted query on the fielded deployment (phrase
        # scores body-only, term clause keeps title 1.5 / body 1.0)
        t0 = time.perf_counter()
        hits, mstats = blk.mixed_topk('z3_1 "z3_2 z3_3"', 10, round_to=6,
                                      return_stats=True)
        n_hits = hits.count()
        out["q_fielded_mixed_phrase"] = round(time.perf_counter() - t0, 2)
        out["fielded_mixed_hits"] = n_hits
        out["fielded_mixed_stats"] = mstats
        # round 4: fielded disjunctive WAND, ladder forced
        t0 = time.perf_counter()
        r, st = blk.topk_wand_or("z3_1 z3_2", 10, round_to=6,
                                 min_prune_blocks=0)
        r.collect()
        out["q_fielded_wand_or_ladder"] = round(time.perf_counter() - t0, 2)
        out["wand_or_ladder_stats"] = st
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
