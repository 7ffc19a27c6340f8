"""Cluster entrypoint: commit an embedding table as an IVF+SQ8 store.

    python tools/package.py                       # -> dist/prosearch_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/prosearch_spark.zip \\
        jobs/vector_index_job.py \\
        --input /data/embeddings_parquet --output /data/vector_index \\
        --n-centroids 1024 --report-probe 8

Commits the table with ``index/vectors.save_vector_index`` — the
deterministic sampled-member IVF quantizer, parquet
``partitionBy(bucket)`` so an n_probe query prunes bucket DIRECTORIES
at the scan, SQ8 bounds trained at commit (exact min/max of the
unit-normalized vectors into the manifest) and 1-byte codes stored as
a column for the ADC candidate scan (``VectorArtifact.sq_topk``).

Writes ``<output>/`` (the artifact: vectors/ + vector_manifest.json)
and ``<output>.report.json`` — bucket-size distribution + the probe
scan fraction at ``--report-probe``, the run's audit record (bucket
skew is the thing to check before serving: a degenerate quantizer
shows up here as one giant bucket, which defeats partition pruning).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="embedding parquet path")
    ap.add_argument("--output", required=True,
                    help="artifact directory (must not hold a manifest)")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-centroids", type=int, default=64)
    ap.add_argument("--report-probe", type=int, default=4,
                    help="n_probe used for the report's scan-fraction row")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from prosearch_spark.index.vectors import save_vector_index

    spark = SparkSession.builder.appName("prosearch-vector-index") \
        .getOrCreate()
    emb = spark.read.parquet(args.input)
    art = save_vector_index(spark, emb, args.output,
                            n_centroids=args.n_centroids,
                            id_col=args.id_col, vec_col=args.vec_col)

    sizes = {int(r["bucket"]): int(r["n"]) for r in
             art.vectors().groupBy("bucket")
             .agg(F.count("*").alias("n")).collect()}
    n = art.manifest["n_vectors"]
    largest = max(sizes.values()) if sizes else 0
    # expected fraction read by an n_probe query against the LARGEST
    # buckets — the adversarial bound; uniform data sits near
    # n_probe/n_centroids
    worst = sorted(sizes.values(), reverse=True)[:args.report_probe]
    report = {
        "n_vectors": n,
        "n_centroids": args.n_centroids,
        "n_buckets_used": len(sizes),
        "largest_bucket": largest,
        "largest_bucket_fraction": round(largest / n, 4) if n else None,
        "worst_case_probe_fraction": (
            round(sum(worst) / n, 4) if n else None),
        "uniform_probe_fraction": round(
            args.report_probe / args.n_centroids, 4),
        "sq_bounds": {"gmin": art.manifest["gmin"],
                      "gmax": art.manifest["gmax"]},
    }
    with open(args.output.rstrip("/") + ".report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
