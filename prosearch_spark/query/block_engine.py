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

    def topk_wand(self, q: str, k: int = 10,
                  round_to: int | None = None) -> tuple[DataFrame, dict]:
        """Block-Max WAND top-k for single-term queries — EXACT results
        with score-based block pruning (the DataFrame shape of the
        reference's block-max skip data, SURVEY.md §4.2/§7 stage 3).

        Sound two-pass scheme over block METADATA (never decodes a
        block it can prove irrelevant):

          pass 1: rank blocks by their BM25 upper bound
                  ub = idf * (k1+1)*max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl))
                  take the smallest prefix (by ub desc) holding >= k
                  postings; decode + score exactly; let s_k = the k-th
                  exact score.
          pass 2: decode ONLY blocks with ub >= s_k. Any doc scoring
                  above s_k must live in such a block (ub bounds every
                  doc in the block), so the final top-k is exact.

        Multi-term conjunctions fall back to topk() (which already
        applies rarest-term doc-range pruning before decode); document-
        at-a-time WAND is iterator-shaped and not a DataFrame win.

        Returns (result, stats) where stats reports blocks total /
        decoded — the pruning evidence.
        """
        from pyspark.sql import Window

        from prosearch_spark.index.blocks import (
            block_upper_bound_expr,
            decode_blocks,
        )
        from prosearch_spark.query.bm25 import SCORE_EXPR

        clauses = analyze_query(q)
        terms = sorted({t for t, _ in clauses})
        if len(clauses) != 1:
            # multi-clause (including duplicated-term) queries sum per
            # clause — route through the general engine
            return self.topk(q, k, round_to), {}
        boost = clauses[0][1]

        blocks = self.artifact.blocks(terms)
        ts = self.artifact.term_stats(terms)
        meta = (
            blocks.join(F.broadcast(ts), "term")
            .join(F.broadcast(self.artifact.stats()))
            .withColumn("ub", F.expr(block_upper_bound_expr()))
        ).persist()
        n_blocks = meta.count()
        if n_blocks == 0:
            meta.unpersist()
            return self.topk(q, k, round_to), {"blocks_total": 0,
                                               "blocks_decoded": 0}

        # pass 1: ub-desc prefix covering >= k postings AND at least B
        # whole blocks — a one-block prefix would take its kth score
        # from ordinary docs and give a toothless threshold; the true
        # heavy hitters concentrate in the highest-ub blocks. Window
        # over block metadata only (tiny rows; a 10^12-doc term still
        # has ~1e7 metadata rows -> fine for one task).
        from prosearch_spark.index.blocks import BLOCK_SIZE

        b_min = max(4, -(-k // BLOCK_SIZE) * 2)
        w = Window.orderBy(F.desc("ub"), F.asc("first_doc"))
        ranked = meta.withColumn("rk", F.row_number().over(w)).withColumn(
            "cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        prefix = ranked.filter(
            (F.col("cum") - F.col("n") < k) | (F.col("rk") <= b_min)
        )
        decoded1 = decode_blocks(prefix.select(
            "term", "first_doc", "last_doc", "n", "max_tf", "min_dl",
            "docs", "tfs", "dls",
        ))
        deletes1 = self.artifact.deletes()
        if deletes1 is not None:
            # tombstones must be applied BEFORE taking the pass-1 kth
            # score: a deleted high scorer would inflate s_k and make
            # the pass-2 prune unsound
            decoded1 = decoded1.join(F.broadcast(deletes1), "doc_id",
                                     "left_anti")
        scored1 = (
            decoded1
            .join(F.broadcast(ts), "term")
            .join(F.broadcast(self.artifact.stats()))
            .withColumn("boost", F.lit(float(boost)))
            .withColumn("s", F.expr(SCORE_EXPR))
        )
        kth = (
            scored1.orderBy(F.desc("s"), F.asc("doc_id")).limit(k)
            .agg(F.min("s").alias("sk"), F.count("*").alias("nk"))
            .collect()[0]
        )
        if kth["nk"] < k:
            # fewer than k postings exist in total -> no pruning possible
            survivors = meta
        else:
            # ub is boost-free; compare against the boost-free kth
            # score. When the caller ranks on ROUNDED scores, a doc in
            # a pruned block could round into a tie with the kth score
            # and win on doc_id — widen the threshold by a FULL rounding
            # step (a half step still lets a doc in [sk-2eps, sk-eps)
            # round onto the kth grid value): round(x) < round(sk) is
            # guaranteed for every pruned x < sk - 10^-r.
            eps = 10 ** (-round_to) if round_to is not None else 0.0
            survivors = meta.filter(
                F.col("ub") >= F.lit((kth["sk"] - eps) / boost)
            )
        n_decoded = survivors.count()

        postings = decode_blocks(survivors.select(
            "term", "first_doc", "last_doc", "n", "max_tf", "min_dl",
            "docs", "tfs", "dls",
        ))
        deletes = self.artifact.deletes()
        if deletes is not None:
            postings = postings.join(F.broadcast(deletes), "doc_id", "left_anti")
        final = (
            postings.join(F.broadcast(ts), "term")
            .join(F.broadcast(self.artifact.stats()))
            .withColumn("boost", F.lit(float(boost)))
            .withColumn("score", F.expr(SCORE_EXPR))
            .select("doc_id", "score")
        )
        if round_to is not None:
            final = final.withColumn("score", F.round("score", round_to))
        top = final.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        out = top.withColumn("rank", F.row_number().over(wr)).select(
            "rank", "doc_id", "score"
        )
        meta.unpersist()
        return out, {"blocks_total": n_blocks, "blocks_decoded": n_decoded}

    def count(self, q: str) -> DataFrame:
        return self._engine(q).count(q)

    def match_scan(self, q: str) -> DataFrame:
        return self._engine(q).match_scan(q)

    def phrase_topk(self, phrase: str, k: int = 10,
                    round_to: int | None = None) -> DataFrame:
        """Exact-phrase BM25 over a positional artifact
        (save_index(with_positions=True)); positions decode only for
        the phrase's terms after bucket/term pruning."""
        from prosearch_spark.index.positions import (
            phrase_matches,
            phrase_topk as _pt,
        )

        terms = [t for t, _ in analyze_query(phrase)]
        postings = self.artifact.postings(sorted(set(terms)))
        if "positions" not in postings.columns:
            raise ValueError("artifact was not built with_positions=True")
        return _pt(self.spark, postings, self.artifact.stats(), phrase, k,
                   round_to)
