"""Round-7 sweep profiler: wall seconds + Spark JOB COUNT per serving
path over the sf0.1 corpus (the bench's own artifacts), so redundant
driver jobs — the dominant fixed cost at bench scale and a real
scheduling cost at any scale — are visible per key.

Usage: python tools/profile_keys_r07.py [sf_dir]
Prints one line per key: name, wall_s, n_jobs.
Not part of the frozen driver bench (bench.py); evidence for
OPTIMIZATION_r07.md only.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prosearch_spark.index.artifact import (  # noqa: E402
    IndexArtifact,
    save_fielded_index,
    save_index,
)
from prosearch_spark.index.build import build_index  # noqa: E402
from prosearch_spark.query.block_engine import BlockSearchEngine  # noqa: E402
from prosearch_spark.query.engine import SearchEngine  # noqa: E402
from prosearch_spark.query.fielded import FieldedBlockSearchEngine  # noqa: E402
from prosearch_spark.session import get_spark, query_mode  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-r07", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    results = []

    def prof(name, fn, warm=False):
        if warm:
            fn()
        sc.setJobGroup(name, name)
        before = set(tracker.getJobIdsForGroup(name))
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        jobs = len(set(tracker.getJobIdsForGroup(name)) - before)
        sc.setJobGroup(None, None)
        results.append((name, round(dt, 3), jobs))
        print(f"{name:32s} {dt:8.3f} s  {jobs:3d} jobs", flush=True)

    idx = build_index(docs, text_col="text").cache()
    idx.postings.count(); idx.term_stats.count(); idx.stats.count()
    eng = SearchEngine(spark, idx)

    art_path = tempfile.mkdtemp(prefix="prof_idx_")
    prof("artifact_commit",
         lambda: save_index(spark, docs, art_path, text_col="text"))
    blk = BlockSearchEngine(spark, IndexArtifact.load(spark, art_path))

    ppath = tempfile.mkdtemp(prefix="prof_pos_")
    prof("positional_commit",
         lambda: save_index(spark, docs, ppath, text_col="text",
                            with_positions=True))
    pblk = BlockSearchEngine(spark, IndexArtifact.load(spark, ppath))

    fpath = tempfile.mkdtemp(prefix="prof_fld_")
    fdocs = docs.withColumn(
        "title", F.concat_ws(" ", F.slice(F.split("text", " "), 1, 4)))
    prof("fielded_commit",
         lambda: save_fielded_index(
             spark, fdocs, fpath, {"title": "title", "body": "text"},
             positional_fields=frozenset({"body"})))
    from prosearch_spark.index.artifact import load_fielded_index
    feng = FieldedBlockSearchEngine(spark, load_fielded_index(spark, fpath))

    with query_mode(spark):
        prof("q_topk_flat", lambda: eng.topk("join hash", 10).collect(),
             warm=True)
        prof("q_blocks_and2",
             lambda: blk.topk("join hash", 10).collect(), warm=True)
        prof("q_wand_single",
             lambda: blk.topk_wand("spark", 10)[0].collect(), warm=True)
        prof("q_wand_and2_pruned",
             lambda: blk.topk_wand("join hash", 10,
                                   min_prune_blocks=0)[0].collect(),
             warm=True)
        prof("q_mixed_phrase",
             lambda: pblk.mixed_topk('spark "join hash"', 10,
                                     round_to=6).collect(), warm=True)
        prof("q_phrase_slop2",
             lambda: pblk.phrase_slop_topk("join hash", 2, 10,
                                           round_to=6).collect(),
             warm=True)
        words = ["spark", "join", "hash", "dup", "table", "the",
                 "scan", "index"]
        mm_batch = [f"{a} {b}" for a in words[:6] for b in words[:4]] \
            + [f'{a} "{b} {c}"'
               for a, b, c in zip(words, words[1:], words[2:])][:6] \
            + ['"spark dup table" the', '"join hash" index']
        prof("q_msearch_mixed32",
             lambda: pblk.multi_mixed_topk(mm_batch, 10,
                                           round_to=6).collect(),
             warm=True)
        prof("q_fielded_and2",
             lambda: feng.topk("join hash", 10, round_to=6).collect(),
             warm=True)
        prof("q_fielded_wand_and2",
             lambda: feng.topk_wand("join hash", 10,
                                    round_to=6)[0].collect(), warm=True)
        prof("q_fielded_mixed_phrase",
             lambda: feng.mixed_topk('spark "join hash"', 10,
                                     round_to=6).collect(), warm=True)
        prof("q_msearch_fielded_mixed4",
             lambda: feng.multi_mixed_topk(
                 ['spark "join hash"', 'the "join hash"~2',
                  "table scan", 'fast "scan group value"~3'], 10,
                 round_to=6).collect(), warm=True)
        blk.artifact.write_doc_store(docs, ["text"])
        prof("q_mlt_blocks",
             lambda: blk.more_like_this(42, 10, max_terms=8, min_df=2,
                                        round_to=6)[0].collect(),
             warm=True)
        prof("q_msearch_mlt4",
             lambda: blk.multi_more_like_this(
                 [42, 101, 257, 404], 10, max_terms=8, min_df=2,
                 round_to=6).collect(), warm=True)

    print("\nname,wall_s,jobs")
    for name, dt, jobs in results:
        print(f"{name},{dt},{jobs}")
    spark.stop()


if __name__ == "__main__":
    main()
