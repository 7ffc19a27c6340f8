"""Hybrid lexical + semantic retrieval via reciprocal-rank fusion.

RRF (Cormack/Clarke/Buettcher, SIGIR 2009): each ranked list
contributes ``1 / (k0 + rank)`` for every document it ranks; a
document's fused score is the sum of its contributions and the final
order is (rrf DESC, doc_id ASC).  The reference engine serves pure
BM25 (serve.rs:336-435); fusion with the embedding ladder
(ops/similarity.py) is the training-data-pipeline extension — the
standard way to combine a fulltext index with a vector index without
score calibration (ranks, not raw scores, so BM25 and cosine need no
common scale).

Float parity with the DuckDB oracle:

- each leg is ranked on ROUNDED scores with the engine-wide
  (score DESC, doc_id ASC) tie-break, so leg ranks are integers both
  engines agree on exactly;
- the fused score is the two-term expression
  ``coalesce(1.0/(k0 + lex_rank), 0.0) + coalesce(1.0/(k0 + sem_rank),
  0.0)`` evaluated LEFT-then-RIGHT — a fixed addition order over
  exactly-representable inputs, so the double is bit-identical in
  Spark and DuckDB;
- round BEFORE the final rank, (rrf DESC, doc_id ASC) tie-break —
  the same round-before-rank rule every other engine uses.

Scale: both legs are already top-``depth`` lists (k-row DataFrames),
so the fusion full-outer join touches at most ``2*depth`` rows; all
real cost lives in the legs, which keep their own 100 TB stories
(Block-Max WAND pruning for the lexical leg, one-pass scan +
TakeOrderedAndProject or LSH buckets for the semantic leg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prosearch_spark.ops.similarity import cosine_topk

DEFAULT_K0 = 60


def rrf_fuse(lex: DataFrame, sem: DataFrame, k: int = 10,
             k0: int = DEFAULT_K0, round_to: int | None = 6) -> DataFrame:
    """Fuse two ranked lists — each ``(rank, doc_id, ...)`` — by RRF.

    Returns ``(rank, doc_id, rrf_score, lex_rank, sem_rank)`` with the
    leg ranks kept as nullable ints (NULL = the leg didn't rank the
    doc), so callers can explain WHY a hit fused where it did.
    """
    lhs = lex.select(F.col("doc_id"), F.col("rank").alias("lex_rank"))
    rhs = sem.select(F.col("doc_id"), F.col("rank").alias("sem_rank"))
    fused = lhs.join(rhs, "doc_id", "full_outer")
    contrib = (
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k0))
                          + F.col("lex_rank").cast("double")),
            F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0))
                          + F.col("sem_rank").cast("double")),
            F.lit(0.0))
    )
    fused = fused.withColumn("rrf_score", contrib)
    if round_to is not None:
        fused = fused.withColumn("rrf_score", F.round("rrf_score", round_to))
    top = fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "rrf_score", "lex_rank", "sem_rank"
    )


def rrf_fuse_batch(lex: DataFrame, sem: DataFrame, k: int = 10,
                   k0: int = DEFAULT_K0,
                   round_to: int | None = 6) -> DataFrame:
    """Batched RRF: fuse per-query ranked lists — each
    ``(query_id, rank, doc_id, ...)`` — for a WHOLE query batch in one
    plan.  Same contribution expression and round-before-rank rule as
    :func:`rrf_fuse`, but the full-outer join keys on
    ``(query_id, doc_id)`` and the final rank is a PARTITIONED window
    (WindowGroupLimit — per-task partial top-k, no global sort), the
    msearch shape.  A query ranked by only one leg still fuses (the
    other leg's rank is NULL -> contributes 0.0).

    Scale: inputs are per-query top-``depth`` lists, so the join
    touches at most ``2 * depth * |batch|`` rows; all real cost lives
    in the legs (one batched lexical decode, one batched embedding
    scan)."""
    lhs = lex.select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    rhs = sem.select("query_id", "doc_id", F.col("rank").alias("sem_rank"))
    fused = lhs.join(rhs, ["query_id", "doc_id"], "full_outer")
    contrib = (
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k0))
                          + F.col("lex_rank").cast("double")),
            F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0))
                          + F.col("sem_rank").cast("double")),
            F.lit(0.0))
    )
    fused = fused.withColumn("rrf_score", contrib)
    if round_to is not None:
        fused = fused.withColumn("rrf_score", F.round("rrf_score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score",
                "lex_rank", "sem_rank")
        .orderBy("query_id", "rank")
    )


def multi_hybrid_topk(engine, emb: DataFrame, queries: list[str],
                      qvecs: DataFrame, k: int = 10, depth: int = 50,
                      k0: int = DEFAULT_K0, round_to: int | None = 6,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Batched hybrid search: ``queries[i]`` (lexical) pairs with the
    ``qvecs`` row whose ``query_id = i`` (semantic); both legs run as
    ONE batched plan each (``engine.multi_topk`` — flat or block —
    and :func:`ops.similarity.multi_cosine_topk`), then fuse per query
    via :func:`rrf_fuse_batch`.  Three jobs serve the whole batch
    regardless of its size — the hybrid msearch shape."""
    from prosearch_spark.ops.similarity import multi_cosine_topk

    lex = engine.multi_topk(queries, depth, round_to=round_to)
    sem = multi_cosine_topk(emb, qvecs, depth, id_col=id_col,
                            vec_col=vec_col, round_to=round_to) \
        .withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse_batch(lex, sem, k=k, k0=k0, round_to=round_to)


def multi_hybrid_topk_ivf(engine, vec_art, queries: list[str],
                          qvecs: DataFrame, k: int = 10, depth: int = 50,
                          n_probe: int = 2, k0: int = DEFAULT_K0,
                          round_to: int | None = 6) -> DataFrame:
    """Batched hybrid with BOTH legs on their 100 TB paths (round 6):
    the lexical batch rides ``engine.multi_topk`` (one shared
    bucket/term-pruned decode) and the semantic batch rides the
    COMMITTED IVF artifact's batched probe
    (:meth:`index.vectors.VectorArtifact.multi_topk` — one scan of the
    union of probed bucket directories, broadcast probe-map equi-join,
    partitioned rank); fusion is the same per-query
    :func:`rrf_fuse_batch`. Still three jobs for the whole batch, but
    the semantic job now reads ~n_probe/n_centroids of the store
    instead of all of it."""
    lex = engine.multi_topk(queries, depth, round_to=round_to)
    sem = vec_art.multi_topk(qvecs, depth, n_probe=n_probe,
                             round_to=round_to) \
        .withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse_batch(lex, sem, k=k, k0=k0, round_to=round_to)


def hybrid_topk_ivf(engine, vec_art, q: str, query_vec: list[float],
                    k: int = 10, depth: int = 50, n_probe: int = 2,
                    k0: int = DEFAULT_K0,
                    round_to: int | None = 6) -> DataFrame:
    """Hybrid serving with BOTH legs on their scale paths (round 6 —
    the only fusion shape that survives 100 TB of embeddings): the
    semantic leg is the COMMITTED IVF artifact's partition-pruned
    probe (index/vectors.VectorArtifact.topk — n_probe bucket
    directories read, ``PartitionFilters`` at the scan, pinned in
    test_round6) instead of an exact full-table cosine scan; the
    lexical leg takes Block-Max WAND when the engine has it
    (``topk_wand`` — exact, so leg ranks match any other lexical
    engine) and plain ``topk`` otherwise. Fusion itself is unchanged:
    two <= ``depth``-row lists, one full-outer join
    (:func:`rrf_fuse`)."""
    if hasattr(engine, "topk_wand"):
        lex, _stats = engine.topk_wand(q, depth, round_to=round_to)
    else:
        lex = engine.topk(q, depth, round_to=round_to)
    sem = vec_art.topk(query_vec, depth, n_probe=n_probe,
                       round_to=round_to) \
        .withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(lex, sem, k=k, k0=k0, round_to=round_to)


def hybrid_topk(engine, emb: DataFrame, q: str, query_vec: list[float],
                k: int = 10, depth: int = 50, k0: int = DEFAULT_K0,
                round_to: int | None = 6, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """BM25 top-``depth`` (any engine exposing ``.topk(q, k,
    round_to=)`` — flat, block/WAND, or segment stack; WAND is exact,
    so any lexical engine yields the same leg) fused with exact cosine
    top-``depth`` over ``emb``.  ``id_col`` values must share the
    lexical doc_id space."""
    lex = engine.topk(q, depth, round_to=round_to)
    sem = cosine_topk(emb, query_vec, depth, id_col=id_col,
                      vec_col=vec_col, round_to=round_to) \
        .withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(lex, sem, k=k, k0=k0, round_to=round_to)
