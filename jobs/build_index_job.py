"""Cluster entrypoint: resumable index build via spark-submit.

    python tools/package.py                       # -> dist/prosearch_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/prosearch_spark.zip \\
        jobs/build_index_job.py \\
        --input /data/corpus_parquet --output /data/index_ckpt \\
        --text-col content --analyzer code --splits 64 --run-id r1

Re-running after a failure resumes: completed splits are skipped via
their lineage rows (B11); finalize commits the block artifact
atomically and writes metrics.json (B10). The driver-side SparkSession
comes from spark-submit's conf — this job sets only analysis-relevant
defaults it owns.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet path")
    ap.add_argument("--output", required=True, help="checkpoint/index dir")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--analyzer", default="code",
                    choices=["code", "white_lower"])
    ap.add_argument("--splits", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--no-finalize", action="store_true",
                    help="build splits only (finalize in a later run)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from prosearch_spark.index.lineage import ResumableIndexBuild

    spark = SparkSession.builder.appName(
        f"prosearch-index-build-{args.run_id}"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    build = ResumableIndexBuild(
        spark, docs, args.output,
        text_col=args.text_col, id_col=args.id_col,
        analyzer=args.analyzer, lang_col=args.lang_col,
        n_splits=args.splits, run_id=args.run_id, n_buckets=args.buckets,
    )
    done_before = sorted(build.completed_splits())
    rows = build.run()
    print(json.dumps({
        "event": "splits_built",
        "resumed_past": done_before,
        "built_now": [r["split_id"] for r in rows],
    }), flush=True)

    if args.no_finalize:
        return 0
    artifact, metrics = build.finalize()
    if not build.verify_content_sha():
        print(json.dumps({"event": "sha_verify", "ok": False}), flush=True)
        return 2
    print(json.dumps({
        "event": "committed",
        "index_path": artifact.path,
        "n_docs": metrics.n_docs,
        "n_postings": metrics.n_postings,
        "bytes_in": metrics.bytes_in,
        "bytes_compressed": metrics.bytes_compressed,
        "files_per_sec": round(metrics.files_per_sec, 2),
        "postings_per_sec": round(metrics.postings_per_sec, 2),
        "sha_verified": True,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
