"""Query engine over the persisted block artifact, with pruning.

The physical-layer twin of query/engine.py. Pruning ladder, applied
before any block is decoded (each level is a plain relational filter —
correct and conservative, per SURVEY.md §7 stage 3):

1. bucket pruning: ``tb IN (buckets(query terms))`` — parquet
   partition-directory pruning (term-dictionary lookup analog).
2. term pruning: ``term IN (...)`` — row-group min/max skipping
   (blocks are written sorted by term).
3. AND doc-range pruning: for conjunctions, only blocks whose
   [first_doc, last_doc] range overlaps some block range of the
   RAREST query term can contain a conjunctive match — a broadcast
   range semi-join on block metadata. This is the DataFrame shape of
   the zipper intersection driving Block-Max WAND (the block-max
   ``max_tf``/``min_dl`` columns additionally bound scores via
   blocks.block_upper_bound_expr for score-based pruning).

Only surviving blocks are varint-decoded (Arrow-batched), then scoring
is byte-identical to the flat engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prosearch_spark.analyzer import analyze_query
from prosearch_spark.index.artifact import IndexArtifact
from prosearch_spark.index.blocks import decode_blocks
from prosearch_spark.index.build import InvertedIndex
from prosearch_spark.query.engine import SearchEngine


class BlockSearchEngine:
    def __init__(self, spark: SparkSession, artifact: IndexArtifact):
        self.spark = spark
        self.artifact = artifact

    def _pruned_blocks(self, terms: list[str]) -> DataFrame:
        blocks = self.artifact.blocks(terms)
        if len(terms) > 1:
            dfs = {
                r["term"]: r["df"]
                for r in self.artifact.term_stats(terms).collect()
            }
            if any(t not in dfs for t in terms):
                # a clause with zero postings -> conjunction is empty
                return blocks.filter(F.lit(False))
            rarest = min(terms, key=lambda t: (dfs[t], t))
            ranges = blocks.filter(F.col("term") == rarest).select(
                F.col("first_doc").alias("rf"), F.col("last_doc").alias("rl")
            )
            blocks = blocks.join(
                F.broadcast(ranges),
                (F.col("first_doc") <= F.col("rl"))
                & (F.col("last_doc") >= F.col("rf")),
                "left_semi",
            )
        return blocks

    def index_for(self, q: str) -> InvertedIndex:
        terms = sorted({t for t, _ in analyze_query(q)})
        postings = decode_blocks(self._pruned_blocks(terms))
        deletes = self.artifact.deletes()
        if deletes is not None:
            postings = postings.join(F.broadcast(deletes), "doc_id", "left_anti")
        return InvertedIndex(
            postings=postings,
            term_stats=self.artifact.term_stats(terms),
            stats=self.artifact.stats(),
        )

    def _engine(self, q: str) -> SearchEngine:
        return SearchEngine(self.spark, self.index_for(q))

    def topk(self, q: str, k: int = 10, round_to: int | None = None) -> DataFrame:
        return self._engine(q).topk(q, k, round_to)

    def count(self, q: str) -> DataFrame:
        return self._engine(q).count(q)

    def match_scan(self, q: str) -> DataFrame:
        return self._engine(q).match_scan(q)
