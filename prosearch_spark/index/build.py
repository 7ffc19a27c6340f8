"""Distributed inverted-index construction.

The Spark rebuild of the reference's index-build pipeline
(tantivy-cli/src/commands/index.rs:28-98): per-thread in-memory segment
building becomes per-task partial aggregation; the background segment
merge (merge.rs:18-31) becomes the one repartition-by-term shuffle.

Logical ("flat") index layout — three DataFrames:

- ``postings(term, doc_id, tf, dl)``: one row per (term, doc) with term
  frequency AND the doc's token count denormalized in. Denormalizing
  ``dl`` is the Spark analog of Tantivy fieldnorms living next to the
  postings (meta.json:13,27): it removes the query-time join against a
  billion-row doc_stats table — BM25 needs only this one table plus two
  broadcast scalars.
- ``term_stats(term, df)``: document frequency per term.
- ``stats(n_docs, avgdl)``: one row; broadcast at query time.

Scale notes (100 TB / 10^12 files):
- tokenize+explode+partial-count pipelines inside one stage per input
  split (whole-stage codegen when the analyzer is the built-in
  white_lower expression; Arrow-batched when the code analyzer UDF runs).
- ``groupBy(doc_id, term)`` keys are near-unique -> map-side combine does
  almost all the work; no skew (doc_id spreads hot terms).
- ``groupBy(term)`` for df has partial aggregation, so hot terms ship one
  partial row per map task, not one row per posting.
- the only per-term materialization (sorted posting arrays) lives in
  ``blocks.py`` and uses a range-partitioned sort, never
  ``collect_list`` over a raw hot term.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prosearch_spark.analyzer import code_tokens, white_lower_tokens


@dataclass
class InvertedIndex:
    """Handle to the three logical index DataFrames (+ provenance)."""

    postings: DataFrame  # term, doc_id, tf, dl
    term_stats: DataFrame  # term, df
    stats: DataFrame  # n_docs, avgdl  (single row)

    def cache(self) -> "InvertedIndex":
        self.postings = self.postings.cache()
        self.term_stats = self.term_stats.cache()
        self.stats = self.stats.cache()
        return self


def tokens(docs: DataFrame, text_col: str, id_col: str = "doc_id",
           analyzer: str = "white_lower", lang_col: str = "lang") -> DataFrame:
    """(doc_id, term) token stream — the B1 ``add_document`` analog."""
    if analyzer == "white_lower":
        tok = white_lower_tokens(text_col)
    elif analyzer == "code":
        tok = code_tokens(text_col, lang_col)
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(tok).alias("term"))


def build_index(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", analyzer: str = "white_lower",
                lang_col: str = "lang") -> InvertedIndex:
    """Build the flat logical index from a document DataFrame.

    One wide plan: scan -> tokenize -> explode -> two aggregations.
    ``dl`` is attached with a window-sum over the already-shuffled
    (doc_id, term) aggregate — doc_id-partitioned, so one extra shuffle
    by doc_id and no join against a separate doc_stats table.
    """
    toks = tokens(docs, text_col, id_col, analyzer, lang_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    postings = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    term_stats = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    total_tokens = toks.select(F.count("*").alias("total_tokens"))
    stats = n_docs.crossJoin(total_tokens).select(
        "n_docs",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    return InvertedIndex(postings=postings, term_stats=term_stats, stats=stats)


def doc_stats(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", analyzer: str = "white_lower",
              lang_col: str = "lang") -> DataFrame:
    """(doc_id, dl) — fieldnorm analog (B9, meta.json:13,27).

    ``dl`` is the exact token count (no 1-byte quantization: we fix one
    definition — exact dl — and use it in engine AND oracle, per
    SURVEY.md §4.3).
    """
    return (
        tokens(docs, text_col, id_col, analyzer, lang_col)
        .groupBy("doc_id")
        .agg(F.count("*").alias("dl"))
    )


def build_fielded_index(docs: DataFrame, field_cols: dict[str, str],
                        id_col: str = "doc_id",
                        basic_fields: frozenset[str] = frozenset({"title"}),
                        analyzer: str = "white_lower",
                        lang_col: str = "lang") -> InvertedIndex:
    """Multi-field index with the reference's two-field semantics.

    ``field_cols`` maps field name -> column (e.g. {"title": "path",
    "body": "content"}). Fields in ``basic_fields`` are indexed
    ``record:"basic"`` (meta.json:12): their postings carry docids only,
    so query-time tf == 1 — we store tf=1.  Per-field df / avgdl / N are
    kept, exactly like per-field Tantivy segment stats.

    Output postings: (field, term, doc_id, tf, dl); term_stats:
    (field, term, df); stats: (field, n_docs, avgdl).
    """
    per_field_tok = []
    for field, col in field_cols.items():
        t = tokens(docs, col, id_col, analyzer, lang_col)
        per_field_tok.append(t.select(F.lit(field).alias("field"), "doc_id", "term"))
    toks = per_field_tok[0]
    for t in per_field_tok[1:]:
        toks = toks.unionByName(t)

    tf = toks.groupBy("field", "doc_id", "term").agg(F.count("*").alias("tf"))
    postings = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("field", "doc_id"))
    )
    basic = [F.lit(f) for f in sorted(basic_fields)]
    if basic:
        postings = postings.withColumn(
            "tf",
            F.when(F.col("field").isin([f for f in sorted(basic_fields)]),
                   F.lit(1).cast("long")).otherwise(F.col("tf")),
        )
    term_stats = tf.groupBy("field", "term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    stats = (
        toks.groupBy("field").agg(F.count("*").alias("total_tokens"))
        .crossJoin(n_docs)
        .select(
            "field",
            "n_docs",
            (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("avgdl"),
        )
    )
    return InvertedIndex(postings=postings, term_stats=term_stats, stats=stats)
