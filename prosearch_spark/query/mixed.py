"""Mixed term + phrase queries through the lenient front-end.

The reference parses user queries leniently (serve.rs:407-409) over a
positional index (meta.json:21-33) — so a complete rebuild must route a
query string like ``spark "join hash"`` to term BM25 for the bare
clause and phrase BM25 for the quoted one, conjunctively
(serve.rs:343-344), summing clause scores exactly like the flat
engine's per-clause sum.

One positional posting table serves both clause kinds (tf/dl for term
scoring, the position arrays for the phrase intersection), so the
corpus is tokenized once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prosearch_spark.analyzer import parse_query_lenient
from prosearch_spark.index.positions import (
    phrase_matches,
    positional_postings,
)
from prosearch_spark.query.bm25 import SCORE_EXPR

_EMPTY = "rank int, doc_id long, score double"


def mixed_topk(spark: SparkSession, docs: DataFrame, q: str, k: int = 10,
               round_to: int | None = None, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k for a lenient query with optional quoted phrases.

    score(d) = sum over term clauses of boost * bm25(term, d)
             + sum over phrase clauses of bm25_phrase(phrase, d)
    where a phrase scores as a synthetic term (tf = phrase frequency,
    df = phrase doc frequency — Lucene PhraseQuery shape, the same
    algebra as index/positions.phrase_topk) and a doc must match EVERY
    clause (conjunction by default).
    """
    clauses = parse_query_lenient(q)
    if not clauses:
        return spark.createDataFrame([], _EMPTY)
    n_clauses = len(clauses)
    term_clauses = [c for kind, c in clauses if kind == "term"]
    phrase_clauses = [c for kind, c in clauses if kind == "phrase"]

    pp = positional_postings(docs, text_col=text_col, id_col=id_col
                             ).persist()
    persisted = [pp]
    try:
        n_docs = docs.count()
        tok_total = pp.agg(F.sum("tf")).collect()[0][0] or 0
        avgdl = tok_total / n_docs if n_docs else 0.0
        stats = spark.createDataFrame([(n_docs, float(avgdl))],
                                      "n_docs long, avgdl double")

        scored_parts: list[DataFrame] = []
        if term_clauses:
            qdf = spark.createDataFrame(term_clauses,
                                        "term string, boost double")
            terms = sorted({t for t, _ in term_clauses})
            ts = (
                pp.filter(F.col("term").isin(terms))
                .groupBy("term").agg(F.count("*").alias("df"))
            )
            scored_parts.append(
                pp.select("term", "doc_id", "tf", "dl")
                .join(F.broadcast(qdf), "term")
                .join(F.broadcast(ts), "term")
                .crossJoin(F.broadcast(stats))
                .withColumn("s", F.expr(SCORE_EXPR))
                .select("doc_id", "s")
            )
        for terms in phrase_clauses:
            m = phrase_matches(pp, terms).persist()
            persisted.append(m)
            phrase_df = m.count()
            if phrase_df == 0:
                return spark.createDataFrame([], _EMPTY)  # conjunction dead
            scored_parts.append(
                m.withColumn("df", F.lit(int(phrase_df)))
                .crossJoin(F.broadcast(stats))
                .withColumn("boost", F.lit(1.0))
                .withColumn("s", F.expr(SCORE_EXPR))
                .select("doc_id", "s")
            )

        from functools import reduce

        scored = reduce(lambda a, b: a.unionByName(b), scored_parts)
        # each clause emits at most one row per doc, so the row count
        # per doc equals the number of matched clauses (same AND shape
        # as SearchEngine._docs_scored)
        d = (
            scored.groupBy("doc_id")
            .agg(F.sum("s").alias("score"), F.count("*").alias("nmatch"))
            .filter(F.col("nmatch") == n_clauses)
            .drop("nmatch")
        )
        if round_to is not None:
            d = d.withColumn("score", F.round("score", round_to))
        top = d.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        rows = top.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score"
        ).collect()
        return spark.createDataFrame(rows, _EMPTY) if rows else \
            spark.createDataFrame([], _EMPTY)
    finally:
        for df in persisted:
            df.unpersist()
