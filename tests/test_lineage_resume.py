"""Resume-from-checkpoint: kill after partial build -> resume ->
identical final index (FIXTURES.md §4; reference B11)."""

from __future__ import annotations

import pytest

from prosearch_spark.index.artifact import save_index
from prosearch_spark.index.lineage import ResumableIndexBuild
from prosearch_spark.query.block_engine import BlockSearchEngine


def test_crash_resume_identical_index(spark, corpus, tmp_path):
    # one-shot reference build
    ref = save_index(spark, corpus, str(tmp_path / "ref"), text_col="content")

    # crashing build: dies at split 2, before its lineage commit
    b = ResumableIndexBuild(spark, corpus, str(tmp_path / "ckpt"),
                            text_col="content", n_splits=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        b.run(fail_at_split=2)
    assert b.completed_splits() == {0, 1}
    with pytest.raises(RuntimeError, match="incomplete"):
        b.finalize()

    # resume: only the missing splits run
    rows = b.run()
    assert sorted(r["split_id"] for r in rows) == [2, 3]
    art, metrics = b.finalize()

    # final artifact == one-shot build (same postings, same stats)
    a = sorted(map(tuple, art.postings(None).collect()))
    r = sorted(map(tuple, ref.postings(None).collect()))
    assert a == r
    assert art.manifest["n_docs"] == ref.manifest["n_docs"]
    assert art.manifest["avgdl"] == pytest.approx(ref.manifest["avgdl"])

    # metrics accounting
    assert metrics.n_docs == ref.manifest["n_docs"]
    assert metrics.n_postings == len(a)
    assert metrics.files_per_sec > 0

    # per-row content invariant
    assert b.verify_content_sha()


def test_resume_is_noop_when_complete(spark, corpus, tmp_path):
    b = ResumableIndexBuild(spark, corpus, str(tmp_path / "ckpt2"),
                            text_col="content", n_splits=2)
    b.run()
    assert b.run() == []  # nothing left to do


def test_resumed_index_queryable(spark, corpus, tmp_path):
    b = ResumableIndexBuild(spark, corpus, str(tmp_path / "ckpt3"),
                            text_col="content", n_splits=3)
    b.run()
    art, _ = b.finalize()
    eng = BlockSearchEngine(spark, art)
    assert eng.topk("spark", 5).count() > 0


def test_finalize_is_rerunnable_after_manifest_publish(spark, corpus, tmp_path):
    """Crash window between manifest publish and metrics.json: a retry
    must complete idempotently, not refuse on the live manifest."""
    b = ResumableIndexBuild(spark, corpus, str(tmp_path / "ckpt4"),
                            text_col="content", n_splits=2)
    b.run()
    art1, m1 = b.finalize()
    # simulate the crash-after-publish state: metrics.json missing
    import os

    os.remove(str(tmp_path / "ckpt4" / "metrics.json"))
    art2, m2 = b.finalize()  # must NOT raise
    assert art2.manifest == art1.manifest
    assert m2.n_docs == m1.n_docs and m2.n_postings == m1.n_postings
    assert os.path.exists(str(tmp_path / "ckpt4" / "metrics.json"))
