"""Multi-field BM25 query engine — the reference's exact field
semantics (serve.rs:336-351 + meta.json:7-47):

- each query clause matches ``title OR body`` (default-field expansion)
- field boosts: title 1.5, body 1.0
- ``title`` is record:"basic" -> tf==1 (enforced at build time by
  build_fielded_index)
- per-field df / N / avgdl feed per-field BM25; a clause's score is
  the field-boost-weighted SUM of its per-field scores; a doc matches
  iff EVERY clause hits at least one field (conjunction).

Plan shape: one broadcast join of (clause_id, term, boost) against the
fielded postings, one groupBy(doc_id) computing both the total score
(sum over every (clause, field) contribution) and the AND predicate
(countDistinct(clause_id) == n_clauses), then TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prosearch_spark.analyzer import analyze_query
from prosearch_spark.index.build import InvertedIndex
from prosearch_spark.query.bm25 import SCORE_EXPR

DEFAULT_FIELD_BOOSTS = {"title": 1.5, "body": 1.0}


class FieldedSearchEngine:
    def __init__(self, spark: SparkSession, index: InvertedIndex,
                 field_boosts: dict[str, float] | None = None):
        self.spark = spark
        self.index = index  # postings: (field, term, doc_id, tf, dl)
        self.field_boosts = field_boosts or DEFAULT_FIELD_BOOSTS

    def _docs_scored(self, q: str) -> DataFrame:
        clauses = analyze_query(q)
        qdf = self.spark.createDataFrame(
            [(i, t, b) for i, (t, b) in enumerate(clauses)],
            "clause_id int, term string, boost double",
        )
        terms = sorted({t for t, _ in clauses})
        ts = self.index.term_stats.filter(F.col("term").isin(terms))

        fb = None
        for field, boost in self.field_boosts.items():
            cond = F.when(F.col("field") == field, F.lit(float(boost)))
            fb = cond if fb is None else fb.when(
                F.col("field") == field, F.lit(float(boost))
            )
        fb = fb.otherwise(F.lit(1.0))

        scored = (
            self.index.postings
            .join(F.broadcast(qdf), "term")
            .join(F.broadcast(ts), ["field", "term"])
            .join(F.broadcast(self.index.stats), "field")
            .withColumn("s", fb * F.expr(SCORE_EXPR))
        )
        return (
            scored.groupBy("doc_id")
            .agg(
                F.sum("s").alias("score"),
                F.countDistinct("clause_id").alias("nmatch"),
            )
            .filter(F.col("nmatch") == len(clauses))
            .drop("nmatch")
        )

    def topk(self, q: str, k: int = 10, round_to: int | None = None) -> DataFrame:
        d = self._docs_scored(q)
        if round_to is not None:
            d = d.withColumn("score", F.round("score", round_to))
        top = d.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score"
        )

    def count(self, q: str) -> DataFrame:
        return self._docs_scored(q).agg(F.count("*").alias("hits"))

    def match_scan(self, q: str) -> DataFrame:
        return self._docs_scored(q).select("doc_id")


def fielded_index_from_artifacts(artifacts: dict, q: str) -> InvertedIndex:
    """Assemble the fielded logical index from per-field block
    artifacts (save_fielded_index layout), term-pruned for query ``q``.

    Per-field postings carry each field's own bucket/term/parquet
    pruning; the union adds the ``field`` tag the fielded scorer
    expects. Per-field df / N / avgdl come from each artifact's
    manifest — exactly Tantivy's per-field segment stats.
    """
    terms = sorted({t for t, _ in analyze_query(q)})
    postings = None
    term_stats = None
    stats = None
    for field, art in sorted(artifacts.items()):
        p = art.postings(terms).select(
            F.lit(field).alias("field"), "term", "doc_id", "tf", "dl"
        )
        t = art.term_stats(terms).select(
            F.lit(field).alias("field"), "term", "df"
        )
        s = art.stats().select(F.lit(field).alias("field"), "n_docs", "avgdl")
        postings = p if postings is None else postings.unionByName(p)
        term_stats = t if term_stats is None else term_stats.unionByName(t)
        stats = s if stats is None else stats.unionByName(s)
    return InvertedIndex(postings=postings, term_stats=term_stats, stats=stats)


class FieldedBlockSearchEngine:
    """Fielded queries over per-field committed artifacts."""

    def __init__(self, spark: SparkSession, artifacts: dict,
                 field_boosts: dict[str, float] | None = None):
        self.spark = spark
        self.artifacts = artifacts
        self.field_boosts = field_boosts or DEFAULT_FIELD_BOOSTS

    def _engine(self, q: str) -> FieldedSearchEngine:
        idx = fielded_index_from_artifacts(self.artifacts, q)
        return FieldedSearchEngine(self.spark, idx, self.field_boosts)

    def topk(self, q: str, k: int = 10, round_to: int | None = None) -> DataFrame:
        return self._engine(q).topk(q, k, round_to)

    def count(self, q: str) -> DataFrame:
        return self._engine(q).count(q)
