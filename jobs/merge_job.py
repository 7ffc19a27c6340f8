"""Cluster entrypoint: full index merge / compaction (B6).

    spark-submit --py-files dist/prosearch_spark.zip jobs/merge_job.py \\
        --input /data/index_gen0 --output /data/index_gen1

Physically applies delete tombstones, recomputes collection stats,
rewrites blocks compacted, commits atomically (merge.rs:18-31 analog;
the old generation stays intact for rollback/GC policy).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from prosearch_spark.index.artifact import IndexArtifact

    spark = SparkSession.builder.appName("prosearch-merge").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    art = IndexArtifact.load(spark, args.input)
    merged = art.merge(args.output)
    print(json.dumps({
        "event": "merged",
        "from": args.input,
        "to": args.output,
        "n_docs": merged.manifest["n_docs"],
        "space_usage": merged.space_usage(),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
