"""Search front-end facade — the reference's /api responder.

Replicates the Serp shape (serve.rs:301-312,436-440): for a query
string, return ``{"q": ..., "num_hits": ..., "hits": [{"doc": {...},
"snip": ...}], "timings_ms": ...}`` with the ``body`` field dropped
from each returned doc (P1, serve.rs:379-386) and per-query latency
reported (Q13). Also implements the warmup sweep (Q11,
serve.rs:220-257): run a query list once so caches/codegen are hot.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prosearch_spark.index.build import InvertedIndex
from prosearch_spark.query.engine import SearchEngine
from prosearch_spark.query.snippet import with_snippet


class ArtifactSearcher:
    """Production /api responder over COMMITTED artifacts, routing each
    parsed query to the best physical plan. The reference exposes ONE
    endpoint; the BooleanQuery built from the lenient parse picks the
    execution over segment skip data (serve.rs:407-419) — here:

      - quoted span + fielded artifacts configured -> fielded lenient
        mixed engine (title 1.5 / body 1.0 kept for term clauses;
        phrases score in the positional body field — round-4 fix: the
        r3 router silently dropped a fielded deployment's quoted
        queries to single-field scoring);
      - quoted span, single-field -> staged-pruning mixed engine over
        the positional artifact (phrase BM25 + term-WAND delegation);
      - fielded artifacts configured, no quotes -> fielded Block-Max
        WAND (title 1.5 / body 1.0, serve.rs:336-351);
      - otherwise -> single-field Block-Max WAND.

    Every branch is exact (each is oracle-gated on its own); routing
    changes COST only — except that configuring ``fielded`` opts into
    fielded scoring semantics, which is the caller's schema choice,
    not a plan choice.
    """

    def __init__(self, spark: SparkSession, artifact,
                 fielded: dict | None = None,
                 body_col: str = "text",
                 vectors=None, n_probe: int = 2):
        from prosearch_spark.query.block_engine import BlockSearchEngine
        from prosearch_spark.query.fielded import FieldedBlockSearchEngine

        self.spark = spark
        self.artifact = artifact
        self.block = BlockSearchEngine(spark, artifact)
        self.fielded = (FieldedBlockSearchEngine(spark, fielded)
                        if fielded else None)
        self.body_col = body_col
        # optional semantic deployment: a committed IVF VectorArtifact
        # (index/vectors.py) sharing the lexical doc_id space; enables
        # hybrid() / msearch_hybrid() with the partition-pruned probe
        self.vectors = vectors
        self.n_probe = n_probe

    def route(self, q: str, k: int = 10,
              round_to: int | None = None) -> tuple[DataFrame, str]:
        """Pick the plan for ``q``; returns (hits, plan_name)."""
        if '"' in q:
            # proximity suffix ("..."~N, round 6): the lenient parser
            # would read the glued ~N as a bare term clause that
            # matches nothing — conjunction dead, EMPTY results for a
            # user typing the standard Lucene syntax. The branch
            # fires whenever the two grammars PARSE DIFFERENTLY (a
            # glued ~suffix exists — including ~0 folds and dropped
            # bad suffixes, which the lenient parse would also turn
            # into dead term clauses), so it is behavior-preserving
            # for every query without one.
            from prosearch_spark.analyzer import (
                parse_query_lenient,
                parse_query_slop,
            )

            if parse_query_slop(q) != parse_query_lenient(q):
                if self.fielded is not None:
                    # the fielded mixed engine parses the proximity
                    # grammar itself (round 6): term clauses keep
                    # title 1.5 / body 1.0, slop clauses score
                    # body-only like phrases
                    return (self.fielded.mixed_topk(q, k, round_to),
                            "fielded_mixed_slop")
                return (self.block.mixed_slop_topk(q, k, round_to),
                        "mixed_slop")
            if self.fielded is not None:
                return (self.fielded.mixed_topk(q, k, round_to),
                        "fielded_mixed")
            return self.block.mixed_topk(q, k, round_to), "mixed"
        if self.fielded is not None:
            df, _stats = self.fielded.topk_wand(q, k, round_to)
            return df, "fielded_wand"
        df, _stats = self.block.topk_wand(q, k, round_to)
        return df, "wand"

    def more_like_this(self, seed_doc_id: int, k: int = 10,
                       round_to: int | None = None,
                       max_terms: int = 8, min_df: int = 2
                       ) -> tuple[DataFrame, str]:
        """Related-docs navigation over the committed deployment
        (serve.rs:336-453's per-result navigation analog): delegates
        to the artifact MLT (doc-store seed fetch + re-analysis +
        disjunctive Block-Max WAND — block_engine.more_like_this).
        On a fielded deployment MLT still runs over the single-field
        body artifact passed as ``artifact``: seed-term selection is a
        per-TERM statistic and the reference's MLT shape is unfielded;
        fielded boosts are a query-string concern the related-docs
        query never has."""
        hits, _stats = self.block.more_like_this(
            seed_doc_id, k, max_terms=max_terms, min_df=min_df,
            round_to=round_to, text_col=self.body_col)
        return hits, "mlt_wand_or"

    def msearch_mlt(self, seed_doc_ids: list[int], k: int = 10,
                    round_to: int | None = None,
                    max_terms: int = 8, min_df: int = 2) -> DataFrame:
        """Related docs for a whole result PAGE: the batched committed
        MLT (block_engine.multi_more_like_this — one doc-store fetch,
        one per-seed selection window, one decode + disjunctive batch
        rank; three jobs regardless of page size). Returns
        (query_id, rank, doc_id, score), query_id = seed doc_id."""
        return self.block.multi_more_like_this(
            seed_doc_ids, k, max_terms=max_terms, min_df=min_df,
            round_to=round_to, text_col=self.body_col)

    def hybrid(self, q: str, query_vec: list[float], k: int = 10,
               depth: int = 50,
               round_to: int | None = None) -> tuple[DataFrame, str]:
        """Hybrid serving over the configured deployments: Block-Max
        WAND lexical leg (FIELDED WAND when a fielded deployment is
        configured — the same schema-choice preference route() makes)
        + the committed IVF store's partition-pruned probe, fused by
        RRF (hybrid.hybrid_topk_ivf — the only fusion shape that holds
        at 100 TB of embeddings). Requires ``vectors`` configured at
        construction."""
        from prosearch_spark.query.hybrid import hybrid_topk_ivf

        if self.vectors is None:
            raise ValueError("no vector artifact configured; pass "
                             "vectors= to ArtifactSearcher")
        lex_eng = self.fielded if self.fielded is not None else self.block
        hits = hybrid_topk_ivf(lex_eng, self.vectors, q, query_vec,
                               k=k, depth=depth, n_probe=self.n_probe,
                               round_to=round_to)
        return hits, ("hybrid_fielded_wand_ivf" if self.fielded
                      else "hybrid_wand_ivf")

    def msearch_hybrid(self, queries: list[str], qvecs: DataFrame,
                       k: int = 10, depth: int = 50,
                       round_to: int | None = None) -> DataFrame:
        """Batched hybrid over the configured deployments: one lexical
        msearch batch + one batched IVF probe + one fused partitioned
        rank (hybrid.multi_hybrid_topk_ivf — three jobs per batch).
        ``qvecs`` is the (query_id, qv) frame pairing with ``queries``
        by list position."""
        from prosearch_spark.query.hybrid import multi_hybrid_topk_ivf

        if self.vectors is None:
            raise ValueError("no vector artifact configured; pass "
                             "vectors= to ArtifactSearcher")
        lex_eng = self.fielded if self.fielded is not None else self.block
        return multi_hybrid_topk_ivf(lex_eng, self.vectors, queries,
                                     qvecs, k=k, depth=depth,
                                     n_probe=self.n_probe,
                                     round_to=round_to)

    def msearch(self, queries: list[str], k: int = 10,
                round_to: int | None = None) -> DataFrame:
        """Batched serving (the Elasticsearch ``_msearch`` analog):
        (query_id, rank, doc_id, score) for every query of the batch,
        query_id = list position.

        The batch SPLITS by plan shape: every unquoted query scores in
        ONE job over one bucket/term-pruned postings fetch
        (multi_topk — fielded boosts kept when ``fielded`` is
        configured). Quoted members batch too on a single-field
        deployment (round 5): multi_mixed_topk groups their phrases by
        LENGTH and runs one position-join plan per length over one
        shared decode, so a 24-term + 8-phrase batch with phrase
        lengths {2, 3} costs three plans, not 9+. On a FIELDED
        deployment quoted (and "..."~N) members batch too (round 6:
        fielded.multi_mixed_topk — one fielded term pass + one
        body-only position-join plan per phrase shape; the batch
        deliberately skips the single-query staged pruning, which
        does not compose across members)."""
        from functools import reduce

        from prosearch_spark.query.engine import MULTI_TOPK_SCHEMA

        term_idx = [i for i, q in enumerate(queries) if '"' not in q]
        quoted_idx = [i for i, q in enumerate(queries) if '"' in q]
        parts: list[DataFrame] = []

        def _remap(batch: DataFrame, idx: list[int]) -> DataFrame:
            if idx == list(range(len(queries))):
                return batch
            # remap the sub-batch's positional ids to the original
            # list positions
            mapping = self.spark.createDataFrame(
                list(enumerate(idx)), "query_id int, orig int")
            return batch.join(F.broadcast(mapping), "query_id") \
                .select(F.col("orig").alias("query_id"), "rank",
                        "doc_id", "score")

        if term_idx:
            eng = self.fielded if self.fielded is not None else self.block
            parts.append(_remap(
                eng.multi_topk([queries[i] for i in term_idx], k,
                               round_to), term_idx))
        if quoted_idx and self.fielded is None:
            parts.append(_remap(
                self.block.multi_mixed_topk(
                    [queries[i] for i in quoted_idx], k, round_to),
                quoted_idx))
        elif quoted_idx:
            # round 6: fielded quoted/slop members batch too —
            # fielded.multi_mixed_topk runs one plan per phrase
            # shape over one body decode + one fielded term pass
            # (the per-member route() loop this replaces paid a
            # full plan per quoted member)
            parts.append(_remap(
                self.fielded.multi_mixed_topk(
                    [queries[i] for i in quoted_idx], k, round_to),
                quoted_idx))
        if not parts:
            return self.spark.createDataFrame([], MULTI_TOPK_SCHEMA)
        return reduce(lambda a, b: a.unionByName(b), parts) \
            .orderBy("query_id", "rank")

    def profile(self, q: str, k: int = 10) -> dict:
        """Per-query diagnostics — the reference's timer tree analog
        (serve.rs:412-419 wraps every search in a timer and ships it
        on the Serp): dispatch ``q`` exactly like ``route`` but with
        each branch's stats surfaced, and report the chosen plan, wall
        seconds, hit count, and the pruning counters
        (blocks_total/blocks_decoded/...) where the branch produces
        them. Diagnostic endpoint: hits are collected and discarded."""
        t0 = time.perf_counter()
        stats: dict = {}
        if '"' in q:
            from prosearch_spark.analyzer import (
                parse_query_lenient,
                parse_query_slop,
            )

            has_slop = parse_query_slop(q) != parse_query_lenient(q)
            if self.fielded is not None:
                # the fielded mixed engine parses the proximity
                # grammar itself; plan name matches route()
                hits, stats = self.fielded.mixed_topk(
                    q, k, round_to=6, return_stats=True)
                plan = "fielded_mixed_slop" if has_slop \
                    else "fielded_mixed"
            elif has_slop:
                # the single-field slop path has no staged pruning
                # (and so no pruning counters) — route()'s engine
                hits = self.block.mixed_slop_topk(q, k, round_to=6)
                plan = "mixed_slop"
            else:
                hits, stats = self.block.mixed_topk(
                    q, k, round_to=6, return_stats=True)
                plan = "mixed"
        elif self.fielded is not None:
            hits, stats = self.fielded.topk_wand(q, k, round_to=6)
            plan = "fielded_wand"
        else:
            hits, stats = self.block.topk_wand(q, k, round_to=6)
            plan = "wand"
        n = len(hits.collect())
        return {
            "q": q,
            "plan": plan,
            "num_hits": n,
            "sec": round(time.perf_counter() - t0, 4),
            "stats": stats,
        }

    def warmup(self, queries: list[str], k: int = 2) -> dict[str, float]:
        """Q11 on the production facade (serve.rs:220-257): run each
        query once through the ROUTER at small k so every branch's
        codegen, broadcast caches, and parquet footers are hot; returns
        per-query seconds keyed by query string."""
        out = {}
        for q in queries:
            t0 = time.perf_counter()
            hits, _plan = self.route(q, k)
            hits.collect()
            out[q] = round(time.perf_counter() - t0, 4)
        return out

    def api(self, q: str, nhits: int = 10) -> dict:
        """The Serp response (serve.rs:301-312): routed hits joined to
        the artifact's doc store, snippets rendered, body dropped (P1),
        latency + chosen plan reported (Q13)."""
        t0 = time.perf_counter()
        hits, plan = self.route(q, nhits, round_to=6)
        fetched = self.artifact.fetch_docs(hits)
        display = [c for c in fetched.columns
                   if c not in {"doc_id", "rank", "score", self.body_col}]
        # parse_query_slop so a "..."~N query highlights its phrase
        # terms instead of a bogus "~N" token
        from prosearch_spark.analyzer import parse_query_slop

        flat_terms = " ".join(
            c[0] if kind == "term"
            else " ".join(c[0]) if kind == "slop"
            else " ".join(c)
            for kind, c in parse_query_slop(q)
        )
        fetched = with_snippet(fetched, flat_terms, self.body_col)
        rows = fetched.orderBy("rank").collect()
        ms = (time.perf_counter() - t0) * 1000.0
        return {
            "q": q,
            "plan": plan,
            "num_hits": len(rows),
            "hits": [
                {
                    "doc": {c: r[c] for c in
                            ("rank", "doc_id", "score", *display)},
                    "snip": r["snip"],
                }
                for r in rows
            ],
            "timings_ms": round(ms, 3),
        }


class Searcher:
    def __init__(self, spark: SparkSession, index: InvertedIndex,
                 docs: DataFrame, id_col: str = "doc_id",
                 body_col: str = "content",
                 display_cols: tuple[str, ...] = ("repo", "path", "lang")):
        self.spark = spark
        self.engine = SearchEngine(spark, index)
        self.docs = docs
        self.id_col = id_col
        self.body_col = body_col
        self.display_cols = display_cols

    def api(self, q: str, nhits: int = 10) -> dict:
        """GET /api/?q=... analog. The reference parses an ``offset``
        param but ignores it (serve.rs:573-587) — so do we."""
        t0 = time.perf_counter()
        hits = self.engine.topk(q, nhits)
        fetched = self.engine.fetch(
            hits,
            self.docs.select(self.id_col, self.body_col, *self.display_cols),
            self.id_col,
        )
        fetched = with_snippet(fetched, q, self.body_col)
        rows = fetched.orderBy("rank").collect()
        ms = (time.perf_counter() - t0) * 1000.0
        return {
            "q": q,
            "num_hits": len(rows),
            "hits": [
                {
                    # P1: drop the body from the returned doc
                    "doc": {c: r[c] for c in
                            ("rank", "doc_id", "score", *self.display_cols)},
                    "snip": r["snip"],
                }
                for r in rows
            ],
            "timings_ms": round(ms, 3),
        }

    def warmup(self, queries: list[str], k: int = 2) -> dict[str, float]:
        """Q11: run each query once (TopDocs(2) analog), return per-
        query seconds. Heats codegen, broadcast caches, file indexes."""
        out = {}
        for q in queries:
            t0 = time.perf_counter()
            self.engine.topk(q, k).collect()
            out[q] = round(time.perf_counter() - t0, 4)
        return out

    def _positional(self):
        """Positional postings + stats, built ONCE per Searcher and
        persisted — quoted-query latency must be O(query), never a
        per-request corpus re-tokenize (round-2 review finding)."""
        if not hasattr(self, "_pp"):
            from prosearch_spark.query.mixed import build_positional

            pp, stats = build_positional(self.spark, self.docs,
                                         self.body_col, self.id_col)
            self._pp = pp.persist()
            self._pp.count()  # materialize the cache eagerly
            self._pp_stats = stats
        return self._pp, self._pp_stats

    def api_lenient(self, q: str, nhits: int = 10) -> dict:
        """The /api responder through the LENIENT grammar
        (serve.rs:407-409): quoted spans run as phrase clauses, bad
        clauses are dropped. Queries without quotes take the plain
        engine path (identical scoring, no positional build)."""
        from prosearch_spark.analyzer import parse_query_lenient
        from prosearch_spark.query.mixed import mixed_topk

        clauses = parse_query_lenient(q)
        if '"' not in q:
            # no quotes -> the lenient parse IS analyze_query's clause
            # list (same raw-token boost rule); take the plain engine
            # path and skip the positional build
            return self.api(q, nhits)
        t0 = time.perf_counter()
        pp, stats = self._positional()
        hits = mixed_topk(self.spark, self.docs, q, nhits,
                          text_col=self.body_col, id_col=self.id_col,
                          pp=pp, stats=stats)
        fetched = self.engine.fetch(
            hits,
            self.docs.select(self.id_col, self.body_col, *self.display_cols),
            self.id_col,
        )
        # highlight using every clause's terms
        flat_terms = " ".join(
            c[0] if kind == "term" else " ".join(c)
            for kind, c in clauses
        )
        fetched = with_snippet(fetched, flat_terms, self.body_col)
        rows = fetched.orderBy("rank").collect()
        ms = (time.perf_counter() - t0) * 1000.0
        return {
            "q": q,
            "num_hits": len(rows),
            "hits": [
                {
                    "doc": {c: r[c] for c in
                            ("rank", "doc_id", "score", *self.display_cols)},
                    "snip": r["snip"],
                }
                for r in rows
            ],
            "timings_ms": round(ms, 3),
        }
