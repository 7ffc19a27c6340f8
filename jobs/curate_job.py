"""Cluster entrypoint: training-data curation funnel via spark-submit.

    python tools/package.py                       # -> dist/prosearch_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/prosearch_spark.zip \\
        jobs/curate_job.py \\
        --input /data/corpus_parquet --output /data/curated \\
        --eval /data/eval_prompts_parquet --eval-col text \\
        --rates '{"en": 0.3, "de": 1.0}' \\
        --budget-tokens 2000000000 --weights '{"en": 0.7, "de": 0.3}'

Runs the cleaning ladder the library gates individually — Gopher
quality rules -> repetition stats -> eval-set decontamination ->
deterministic stratified sampling (`ops/curate.curation_funnel`) —
then, when a token budget is given, domain-mixture selection
(`ops/curate.mixture_sample`) over the funnel's survivors. Writes:

- ``<output>/survivors``: the selected documents (full input schema);
- ``<output>/report.json``: per-stage drop counts + selected token
  mass per stratum — the run's audit record.

Every stage is deterministic (salted sha256 hashes, integer token
cumsums), so re-running the job on the same input reproduces the
same selection bit-for-bit — and the per-stage counts match the
oracle-gated library entries the driver checks at sf0.01.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--eval", default=None,
                    help="parquet of eval/benchmark texts (decontamination "
                         "is skipped when omitted)")
    ap.add_argument("--eval-col", default="text")
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--rates", default="{}",
                    help="JSON stratum -> sampling rate")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--salt", default="s1")
    ap.add_argument("--budget-tokens", type=int, default=None,
                    help="global token budget (enables mixture selection)")
    ap.add_argument("--weights", default="{}",
                    help="JSON stratum -> mixture weight (with --budget-tokens)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from prosearch_spark.ops import curate as cu

    spark = SparkSession.builder.appName("prosearch-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    if args.eval is not None:
        ev = spark.read.parquet(args.eval).select(
            F.col(args.eval_col).alias("text"))
    else:
        # empty eval set: decontamination passes everything, the
        # funnel's stage order and outputs stay identical
        ev = spark.createDataFrame([], "text string")

    funnel = cu.curation_funnel(
        docs, ev, rates=json.loads(args.rates),
        strata_col=args.strata_col, content_col=args.text_col,
        id_col=args.id_col, n=args.ngram, salt=args.salt,
        default_rate=args.default_rate,
    ).persist()
    drop_mix = {
        (r["drop_stage"] or "kept"): r["n"]
        for r in funnel.groupBy("drop_stage").agg(F.count("*").alias("n"))
        .collect()
    }
    survivors = docs.join(
        funnel.filter(F.col("keep")).select(
            F.col("doc_id").alias(args.id_col)),
        args.id_col, "left_semi")

    report: dict = {"event": "curated", "drop_mix": drop_mix,
                    "n_input": sum(drop_mix.values()),
                    "n_survivors": drop_mix.get("kept", 0)}

    if args.budget_tokens is not None:
        sel = cu.mixture_sample(
            survivors, budget_tokens=args.budget_tokens,
            weights=json.loads(args.weights),
            strata_col=args.strata_col, content_col=args.text_col,
            id_col=args.id_col, salt=args.salt,
        ).persist()
        survivors = docs.join(
            sel.filter(F.col("keep")).select(
                F.col("doc_id").alias(args.id_col)),
            args.id_col, "left_semi")
        per_stratum = [
            {"stratum": r["stratum"], "n_docs": r["n"],
             "n_tokens": r["t"], "budget": r["b"]}
            for r in sel.filter(F.col("keep")).groupBy("stratum").agg(
                F.count("*").alias("n"), F.sum("n_tokens").alias("t"),
                F.max("stratum_budget").alias("b")).collect()
        ]
        report["mixture"] = sorted(per_stratum, key=lambda d: d["stratum"])
        sel.unpersist()

    survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    with open(_report_path(args.output), "w") as f:
        json.dump(report, f)
    print(json.dumps(report), flush=True)
    funnel.unpersist()
    return 0


def _report_path(output: str) -> str:
    import os

    os.makedirs(output, exist_ok=True)
    return f"{output}/report.json"


if __name__ == "__main__":
    sys.exit(main())
