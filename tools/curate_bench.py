"""Curation-funnel scaling ladder: is the cleaning scan flat per doc?

BENCH.md §2g claims the composed curation funnel (quality →
repetition → decontamination → stratified sampling) "stays flat
per-doc at any corpus size" because every stage is either a pure
projection or a groupBy(doc_id) agg co-partitioned with the joins that
follow. This script measures that claim: the SAME funnel over the
deterministic synth corpus at a geometric ladder of sizes, reporting
wall seconds, per-doc microseconds, and the per-stage drop mix at each
rung. Flat (or falling, as fixed job overhead amortizes) µs/doc across
a 16× size spread is the scale evidence; a rising curve would flag a
super-linear stage.

The mixture_sample window (one partitioned cumsum per stratum) rides
the same ladder as a second series — it adds the only shuffle whose
skew bound is the largest stratum, so its µs/doc curve is the one to
watch at 100 TB.

Usage: python tools/curate_bench.py [sizes_csv]   (default
25000,100000,400000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1
              else "25000,100000,400000").split(",")]

    from pyspark.sql import functions as F

    from prosearch_spark.analyzer import white_lower_tokens
    from prosearch_spark.corpus import synth_corpus
    from prosearch_spark.ops import curate as cu
    from prosearch_spark.session import get_spark

    spark = get_spark("curate-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "curation_funnel_scaling", "sizes": sizes,
                 "rungs": []}
    rates = {lang: r for lang, r in
             [("java", 1.0), ("python", 0.2), ("rust", 0.5),
              ("go", 0.5), ("scala", 0.0)]}
    weights = {"java": 0.5, "python": 0.2, "rust": 0.2, "go": 0.1}

    for n in sizes:
        docs = synth_corpus(spark, n, dense_ids=False).persist()
        docs.count()  # materialize outside the timed window
        ev = docs.filter(F.col("doc_id") % 29 == 0).select(
            F.concat_ws(" ", F.slice(white_lower_tokens("content"), 1, 12))
            .alias("text"))

        t0 = time.perf_counter()
        funnel = cu.curation_funnel(docs, ev, rates=rates,
                                    strata_col="lang",
                                    content_col="content").persist()
        mix = {r["drop_stage"]: r["n"] for r in
               funnel.groupBy("drop_stage")
               .agg(F.count("*").alias("n")).collect()}
        funnel_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        kept = cu.mixture_sample(docs, budget_tokens=40 * n,
                                 weights=weights, strata_col="lang",
                                 content_col="content") \
            .filter(F.col("keep")).count()
        mix_s = time.perf_counter() - t0

        # chunk + pack: the explode fan-out plus the per-stratum
        # packing window — the context-prep cost per corpus doc
        t0 = time.perf_counter()
        ch = cu.chunk_documents(docs, chunk_tokens=64, stride=64,
                                content_col="content")
        n_packs = (
            cu.pack_sequences(
                ch.join(docs.select("doc_id", "lang"), "doc_id"),
                context_tokens=512, strata_col="lang")
            .agg(F.countDistinct("stratum", "pack_id").alias("p"))
            .collect()[0]["p"]
        )
        pack_s = time.perf_counter() - t0

        out["rungs"].append({
            "n_docs": n,
            "funnel_sec": round(funnel_s, 3),
            "funnel_us_per_doc": round(1e6 * funnel_s / n, 2),
            "drop_mix": {str(k): v for k, v in sorted(
                mix.items(), key=lambda kv: str(kv[0]))},
            "mixture_sec": round(mix_s, 3),
            "mixture_us_per_doc": round(1e6 * mix_s / n, 2),
            "mixture_kept": kept,
            "chunk_pack_sec": round(pack_s, 3),
            "chunk_pack_us_per_doc": round(1e6 * pack_s / n, 2),
            "n_packs": n_packs,
        })
        funnel.unpersist()
        docs.unpersist()

    first, last = out["rungs"][0], out["rungs"][-1]
    out["size_spread"] = round(last["n_docs"] / first["n_docs"], 1)
    out["funnel_us_ratio_last_over_first"] = round(
        last["funnel_us_per_doc"] / first["funnel_us_per_doc"], 3)
    out["mixture_us_ratio_last_over_first"] = round(
        last["mixture_us_per_doc"] / first["mixture_us_per_doc"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
