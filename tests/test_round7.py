"""Round 7 (optimization): pins for the flat-codegen SQ8 rewrite and
the join-shaped quantized re-rank.

1. similarity.sq_topk / save_vector_index no longer evaluate the norm
   aggregate inside per-element transform() lambdas (the r6 knn_sq
   0.49->6.02 s regression — VERDICT r6 "What's wrong #1"); the flat
   left-assoc expansion must stay BIT-IDENTICAL to the HOF reference
   form (pinned here against a test-local copy of the old expression).
2. VectorArtifact.sq_topk / pq_topk re-rank via a broadcast equi-join
   of the candidate DataFrame — never a driver collect + IN-literal
   refilter (VERDICT r6 "What's wrong #2"; at PQ's required candidate
   depth of ~0.4% of the store an IN list would be millions of plan
   literals). Pinned on the executed plan.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _toy_emb(spark, n=30, dim=8):
    rows = [(i, [float(((i * 7 + j * 3) % 11) - 5) for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


QVEC = [1.0, -2.0, 0.5, 3.0, -1.0, 0.0, 2.0, -0.5]


def _hof_sq_topk(emb, query_id, k, candidates, round_to=6):
    """Test-local copy of the PRE-r7 sq_topk (unit_col/sq_quantize_col
    HOF forms, crossJoin'd bounds, per-element norm re-evaluation) —
    the bit-identity reference the flat rewrite must reproduce."""
    from pyspark.sql import Window

    from prosearch_spark.ops.similarity import (
        _dot,
        _norm,
        sq_bounds,
        sq_quantize_col,
        unit_col,
    )

    stats = sq_bounds(
        emb.select(unit_col(F.col("embedding")).alias("_nv")), "_nv")
    q = (emb.filter(F.col("vec_id") == query_id)
         .select(F.col("embedding").alias("qv")))
    base = (emb.filter(F.col("vec_id") != query_id)
            .crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(q)))
    qe = sq_quantize_col(unit_col(F.col("embedding")),
                         F.col("gmin"), F.col("gmax"))
    qq = unit_col(F.col("qv"))
    iscore = F.aggregate(
        F.zip_with(qe, qq, lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    cand = (
        base.select(F.col("vec_id"),
                    iscore.alias("sq_score"),
                    F.col("embedding").alias("v"), "qv")
        .orderBy(F.desc("sq_score"), F.asc("vec_id"))
        .limit(candidates)
    )
    rescored = cand.select(
        "vec_id",
        F.round("sq_score", round_to).alias("sq_score"),
        F.round(_dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * _norm(F.col("qv"))), round_to)
        .alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "vec_id", "sq_score", "cosine")
    )


def test_flat_sq_topk_bit_identical_to_hof_reference(spark):
    """The flat-codegen sq_topk must reproduce the old HOF pipeline
    EXACTLY (scores to the last bit, same candidate cut, same ties) —
    including a zero vector (unit -> all zeros) and varied norms."""
    from prosearch_spark.ops import similarity as sim

    # (no zero vector here: a zero-norm CANDIDATE divides by zero in
    # the exact-cosine re-rank under ANSI — pre-existing in the old
    # HOF form too; the when(n==0) unit branch is pinned on the
    # commit-codes test below where the quantizer guards it)
    emb = _toy_emb(spark, n=40)
    got = sim.sq_topk(emb, query_id=0, k=7, candidates=15).collect()
    want = _hof_sq_topk(emb, query_id=0, k=7, candidates=15).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_flat_commit_codes_bit_identical_to_hof_reference(
        spark, tmp_path):
    """save_vector_index's flat code projection must store byte-for-
    byte the codes the old unit_col/sq_quantize_col HOF form
    produces (manifest bounds identical too)."""
    from prosearch_spark.index.vectors import save_vector_index
    from prosearch_spark.ops.similarity import (
        sq_quantize_col,
        unit_col,
    )

    emb = _toy_emb(spark, n=25).unionByName(spark.createDataFrame(
        [(99, [0.0] * 8)], "vec_id long, embedding array<float>"))
    art = save_vector_index(spark, emb, str(tmp_path / "flatsq"),
                            n_centroids=3)
    gmin, gmax = art.manifest["gmin"], art.manifest["gmax"]
    # HOF reference bounds
    nv = unit_col(F.col("embedding"))
    ref = emb.agg(
        F.min(F.array_min(nv)).cast("double").alias("gmin"),
        F.max(F.array_max(nv)).cast("double").alias("gmax")).head()
    assert (gmin, gmax) == (ref["gmin"], ref["gmax"])
    hof_code = F.transform(
        sq_quantize_col(unit_col(F.col("embedding")),
                        F.lit(gmin), F.lit(gmax)),
        lambda c: (c - F.lit(128.0)).cast("tinyint"))
    want = {r["vec_id"]: list(r["c"]) for r in
            emb.select("vec_id", hof_code.alias("c")).collect()}
    got = {r["vec_id"]: list(r["code"]) for r in
           art.vectors().select("vec_id", "code").collect()}
    assert got == want


def _assert_join_shaped(df, plan_str):
    # no IN-literal refilter over candidate ids (bucket partition
    # filters legitimately use IN — restrict the check to vec_id)
    assert not re.search(r"vec_id#\d+L? IN \(", plan_str), plan_str
    assert "In(vec_id" not in plan_str, plan_str
    assert "BroadcastHashJoin" in plan_str, plan_str


def test_sq_topk_rerank_is_join_shaped(spark, tmp_path):
    """VectorArtifact.sq_topk: candidates reach the exact re-rank via
    a broadcast equi-join, not a driver collect + isin literal list;
    partition pruning still holds; output values unchanged vs the
    exact-cosine-over-candidates semantics (test_round6 pins those)."""
    from prosearch_spark.index.vectors import save_vector_index

    emb = _toy_emb(spark, n=60)
    art = save_vector_index(spark, emb, str(tmp_path / "jsq"),
                            n_centroids=4)
    out = art.sq_topk(QVEC, k=5, n_probe=2, candidates=12, round_to=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    _assert_join_shaped(out, plan)
    assert "PartitionFilters" in plan and "bucket" in plan
    assert [r["rank"] for r in out.collect()] == list(range(1, 6))


def test_pq_topk_rerank_is_join_shaped(spark, tmp_path):
    from prosearch_spark.index.vectors import save_vector_index

    emb = _toy_emb(spark, n=60)
    art = save_vector_index(spark, emb, str(tmp_path / "jpq"),
                            n_centroids=4, pq_m=4, pq_k=8)
    out = art.pq_topk(QVEC, k=5, n_probe=2, candidates=12, round_to=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    _assert_join_shaped(out, plan)
    assert "PartitionFilters" in plan and "bucket" in plan
    assert [r["rank"] for r in out.collect()] == list(range(1, 6))


def test_multi_sq_topk_batches_prune_and_read_codes_only(
        spark, tmp_path):
    """VectorArtifact.multi_sq_topk (r6 verdict item 6): the batch
    candidate pass scans (vec_id, bucket, code) of the probed-bucket
    union ONCE — never the float64 embeddings — with PartitionFilters
    intact, and every per-query slice equals single-query sq_topk
    bit-for-bit (same ADC candidates, same rounding, same re-rank)."""
    from prosearch_spark.index.vectors import save_vector_index

    emb = _toy_emb(spark, n=80)
    art = save_vector_index(spark, emb.filter(F.col("vec_id") >= 4),
                            str(tmp_path / "msq"), n_centroids=5)
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"))
    batch = art.multi_sq_topk(qs, k=6, n_probe=2, candidates=12,
                              round_to=6)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    # the candidate scan projects codes, not embeddings: of the scans
    # in the plan, at least one reads code WITHOUT embedding
    schemas = [ln.split("ReadSchema")[1].split(">")[0]
               for ln in plan.replace("ReadSchema", "\nReadSchema")
               .splitlines() if ln.startswith("ReadSchema")]
    assert any("code" in s and "embedding" not in s for s in schemas), \
        schemas
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["sq_score"], r["cosine"]))
    qrows = qs.collect()
    assert set(got) == {r["query_id"] for r in qrows}
    for r in qrows:
        single = [(x["rank"], x["vec_id"], x["sq_score"], x["cosine"])
                  for x in art.sq_topk(
                      [float(v) for v in r["qv"]], 6, n_probe=2,
                      candidates=12, round_to=6).collect()]
        assert got[r["query_id"]] == single, r["query_id"]


def test_in_plan_half_up_round_matches_python_twin(spark):
    """_round_half_up_col must be the EXACT float formula of
    _round_half_up (floor(x*scale+0.5)/scale in IEEE doubles) — not
    F.round's BigDecimal path — for positive, negative, and
    boundary-ish doubles."""
    from prosearch_spark.ops.similarity import (
        _round_half_up,
        _round_half_up_col,
    )

    xs = [0.0, 1.2345675, -1.2345675, 2.5e-7, -2.5e-7, 123456.789,
          0.1 + 0.2, -0.3000004999999, 98765.43210987, 1e-12]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r["y"] for r in
           df.select(_round_half_up_col(F.col("x"), 6).alias("y"))
           .collect()]
    want = [_round_half_up(x, 6) for x in xs]
    assert got == want
