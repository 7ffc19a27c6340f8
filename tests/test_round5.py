"""Round-5 additions: batched quoted msearch (one plan per phrase
shape) and its serving route, over clean artifacts AND live
(tombstoned) segment stacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prosearch_spark.index.artifact import save_index
from prosearch_spark.query.block_engine import BlockSearchEngine

MIXED_BATCH = [
    "spark",
    'spark "join hash"',          # term + 2-phrase
    '"spark dup table" the',      # 3-phrase + term
    "join hash",
    '"zzz qqq" spark',            # dead phrase member
    '"" spark "dup" "join hash" "dangling tail',  # lenient junk
]


@pytest.fixture(scope="module")
def pos_art(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r5pos") / "art")
    return save_index(spark, corpus, path, text_col="content",
                      with_positions=True, n_buckets=4)


def _rows(df):
    return [(r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in df.collect()]


def test_multi_mixed_topk_matches_per_query(spark, pos_art):
    """The batch must reproduce each member's single-query mixed
    result exactly — including the dead-phrase member contributing
    zero rows without emptying the batch."""
    eng = BlockSearchEngine(spark, pos_art)
    batch = _rows(eng.multi_mixed_topk(MIXED_BATCH, 5, round_to=6))
    assert batch, "batch returned nothing"
    for qi, q in enumerate(MIXED_BATCH):
        single = [(qi, r["rank"], r["doc_id"], r["score"])
                  for r in eng.mixed_topk(q, 5, round_to=6).collect()]
        assert [t for t in batch if t[0] == qi] == single, q
    assert not [t for t in batch if t[0] == 4]  # dead phrase member


def test_multi_mixed_topk_scheduling(spark, pos_art):
    """The batch runs ONE action whose AQE stages amortize across all
    members (under AQE every exchange materialization surfaces as a
    'job', so an absolute cap is meaningless — the claim is
    comparative): the batched plan must schedule well under half the
    jobs the per-query sequential path pays for the same members, and
    its job count must not scale with the member count (the fixed
    plans-per-SHAPE property: re-running with the batch doubled adds
    shape-work, not per-member work)."""
    sc = spark.sparkContext
    eng = BlockSearchEngine(spark, pos_art)
    eng.multi_mixed_topk(MIXED_BATCH, 5, round_to=6).collect()  # warm

    def count(group, thunk):
        sc.setJobGroup(group, group)
        try:
            thunk()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group) or [])

    jb6 = count("r5-msq-batch6", lambda: eng.multi_mixed_topk(
        MIXED_BATCH, 5, round_to=6).collect())
    jb24 = count("r5-msq-batch24", lambda: eng.multi_mixed_topk(
        MIXED_BATCH * 4, 5, round_to=6).collect())
    # same shapes, 4x the members: scheduling stays ~flat
    assert jb24 <= jb6 * 1.5 + 2, (jb6, jb24)

    def seq():
        for q in MIXED_BATCH:
            eng.mixed_topk(q, 5, round_to=6).collect()

    js6 = count("r5-msq-seq", seq)
    # sequential scheduling is linear in members BY CONSTRUCTION (an
    # independent collect per member), so 4x the members costs 4*js6;
    # the flat batch must come in under half of that
    assert jb24 < js6 * 4 / 2, (jb24, js6)


def test_serve_msearch_batches_quoted(spark, corpus, pos_art):
    """ArtifactSearcher.msearch on a single-field deployment now
    serves quoted members through the batched plan; results must
    still match the per-query routes."""
    from prosearch_spark.query.serve import ArtifactSearcher

    s = ArtifactSearcher(spark, pos_art, body_col="content")
    batch = _rows(s.msearch(MIXED_BATCH, k=5, round_to=6))
    for qi, q in enumerate(MIXED_BATCH):
        hits, _plan = s.route(q, 5, round_to=6)
        single = [(qi, r["rank"], r["doc_id"], r["score"])
                  for r in hits.collect()]
        assert [t for t in batch if t[0] == qi] == single, q


def test_multi_mixed_topk_live_stack(spark, corpus, tmp_path):
    """Batched mixed msearch over a LIVE tombstoned stack: the shared
    decode carries seg tags, deletes anti-join per segment, and the
    batch matches the per-query mixed engine over the same view."""
    from prosearch_spark.index.segments import SegmentedIndex

    root = str(tmp_path / "r5livemix")
    si = SegmentedIndex(spark, root, merge_factor=8)
    stale = F.col("doc_id") % 5 == 0
    si.commit(
        corpus.withColumn(
            "content",
            F.when(stale, F.lit("stale placeholder"))
            .otherwise(F.col("content")),
        ),
        text_col="content", with_positions=True,
    )
    si.upsert(corpus.filter(stale), text_col="content",
              with_positions=True)
    view = si.as_artifact()
    assert view.deletes() is not None
    eng = BlockSearchEngine(spark, view)
    sub = MIXED_BATCH[:4]
    batch = _rows(eng.multi_mixed_topk(sub, 5, round_to=6))
    for qi, q in enumerate(sub):
        single = [(qi, r["rank"], r["doc_id"], r["score"])
                  for r in eng.mixed_topk(q, 5, round_to=6).collect()]
        assert [t for t in batch if t[0] == qi] == single, q
    # no stale text survives anywhere in the batch results
    assert not [t for t in _rows(
        eng.multi_mixed_topk(["placeholder"], 5, round_to=6))]
