"""Fielded (title/body) rank identity vs oracle + snippet tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prosearch_spark.index.build import build_fielded_index
from prosearch_spark.oracle import build_oracle_index, topk as oracle_topk
from prosearch_spark.query.fielded import FieldedSearchEngine
from prosearch_spark.query.snippet import make_snippet_py, with_snippet


@pytest.fixture(scope="module")
def titled(spark, corpus):
    """Corpus with a title = first 4 content tokens (overlaps body
    vocabulary, so clauses hit title and body simultaneously)."""
    return corpus.withColumn(
        "title", F.concat_ws(" ", F.slice(F.split("content", " "), 1, 4))
    ).cache()


@pytest.fixture(scope="module")
def fielded(spark, titled):
    idx = build_fielded_index(titled, {"title": "title", "body": "content"})
    eng = FieldedSearchEngine(spark, idx)
    rows = [r.asDict() for r in titled.collect()]
    oidx = build_oracle_index(rows, {"title": "title", "body": "content"})
    return eng, oidx


FIELDED_QUERIES = [
    "spark",
    "python",          # boosted
    "spark shuffle",
    "return the",
    "merge commit block",
    "nonexistent",
]


@pytest.mark.parametrize("q", FIELDED_QUERIES)
def test_fielded_rank_identity(fielded, q):
    eng, oidx = fielded
    got = eng.topk(q, 10).collect()
    exp = oracle_topk(oidx, q, 10, fields=("title", "body"))
    assert [r["doc_id"] for r in got] == [d for d, _ in exp], q
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_title_boost_lifts_title_hits(fielded):
    """A term in both title+body must outscore the same term in body
    only, all else equal (field boost 1.5 + extra field term)."""
    eng, oidx = fielded
    got = eng.topk("spark", 200).collect()
    # oracle: recompute per-doc which field hit
    by_doc = {d: s for d, s in oracle_topk(oidx, "spark", 10**9,
                                           fields=("title", "body"))}
    title_hits = {d for (t, d) in oidx.tf["title"] if t == "spark"}
    body_only = [d for d in by_doc if d not in title_hits]
    in_title = [d for d in by_doc if d in title_hits]
    if in_title and body_only:
        assert max(by_doc[d] for d in in_title) > 0
    assert [r["doc_id"] for r in got][:5] == \
        [d for d, _ in oracle_topk(oidx, "spark", 5, fields=("title", "body"))]


def test_fielded_count(fielded):
    eng, oidx = fielded
    got = eng.count("spark shuffle").collect()[0]["hits"]
    exp = len(oracle_topk(oidx, "spark shuffle", 10**9, fields=("title", "body")))
    assert got == exp


def test_fielded_block_artifact_parity(spark, titled, fielded, tmp_path):
    """Per-field committed artifacts must reproduce the logical fielded
    engine exactly (record:basic title tf=1 applied at write time)."""
    from prosearch_spark.index.artifact import (
        load_fielded_index,
        save_fielded_index,
    )
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine

    eng, _ = fielded
    save_fielded_index(spark, titled, str(tmp_path / "fidx"),
                       {"title": "title", "body": "content"})
    arts = load_fielded_index(spark, str(tmp_path / "fidx"))
    blk = FieldedBlockSearchEngine(spark, arts)
    for q in ["spark", "spark shuffle", "return the"]:
        a = [(r["doc_id"], r["score"]) for r in eng.topk(q, 10).collect()]
        b = [(r["doc_id"], r["score"]) for r in blk.topk(q, 10).collect()]
        assert a == b, q


# -- snippets -------------------------------------------------------------------

def test_snippet_highlights_terms():
    text = "alpha beta gamma delta epsilon zeta eta theta"
    s = make_snippet_py(text, {"delta", "zeta"}, window=4)
    assert "<b>delta</b>" in s
    assert len(s.split()) <= 4


def test_snippet_no_match_returns_head():
    text = "one two three four five six"
    s = make_snippet_py(text, {"absent"}, window=3)
    assert s == "one two three"


def test_snippet_case_insensitive():
    s = make_snippet_py("Alpha BETA gamma", {"beta"}, window=3)
    assert "<b>BETA</b>" in s  # original casing preserved, match lowered


def test_with_snippet_udf(spark):
    df = spark.createDataFrame(
        [(0, "spark shuffle partition spark join")],
        "doc_id long, content string",
    )
    out = with_snippet(df, "spark", "content").collect()[0]["snip"]
    assert "<b>spark</b>" in out


def test_snippet_escapes_document_html():
    """T9 at the place it matters: raw document text must never inject
    markup into the SERP snippet — only the highlight's own <b> tags
    may appear (r2 review XSS finding)."""
    from prosearch_spark.query.snippet import make_snippet_py

    text = "safe <script>alert(1)</script> needle & \"quoted\" end"
    out = make_snippet_py(text, {"needle"})
    assert "<script>" not in out
    assert "&lt;script&gt;alert(1)&lt;/script&gt;" in out
    assert "<b>needle</b>" in out
    assert "&amp;" in out and "&quot;quoted&quot;" in out
    # no-hit branch escapes too
    out2 = make_snippet_py("<img src=x> plain", {"zzz"})
    assert "<img" not in out2 and "&lt;img" in out2


# -- fielded Block-Max WAND -----------------------------------------------------

@pytest.fixture(scope="module")
def fielded_arts(spark, titled, tmp_path_factory):
    from prosearch_spark.index.artifact import (
        load_fielded_index,
        save_fielded_index,
    )

    path = str(tmp_path_factory.mktemp("fwand"))
    save_fielded_index(spark, titled, path,
                       {"title": "title", "body": "content"})
    return load_fielded_index(spark, path)


@pytest.mark.parametrize("q,k", [("spark", 10), ("spark shuffle", 5),
                                 ("return the", 10), ("python", 10),
                                 ("spark spark", 5), ("nonexistent", 10)])
def test_fielded_wand_exact(spark, fielded_arts, titled, q, k):
    """Fielded WAND (full ladder forced) matches the unpruned fielded
    block engine exactly under round-before-rank."""
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine

    blk = FieldedBlockSearchEngine(spark, fielded_arts)
    exp = [(r["doc_id"], r["score"])
           for r in blk.topk(q, k, round_to=6).collect()]
    got_df, stats = blk.topk_wand(q, k, round_to=6, min_prune_blocks=0)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert got == exp, (q, stats)
    assert stats["blocks_total"] >= stats["blocks_decoded"]


def test_fielded_wand_short_circuit_default(spark, fielded_arts):
    """Small corpus + default cost cutoff: one exact decode, no ladder."""
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine

    blk = FieldedBlockSearchEngine(spark, fielded_arts)
    got, stats = blk.topk_wand("spark shuffle", 5, round_to=6)
    assert stats.get("short_circuit") is True, stats
    exp = [(r["doc_id"], r["score"])
           for r in blk.topk("spark shuffle", 5, round_to=6).collect()]
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == exp


def test_fielded_wand_exact_on_zipf(spark, tmp_path):
    """Long-tail corpus through the fielded ladder stays exact. (No
    pruning assert here: z-terms appear in scattered background TITLES,
    whose sparse posting blocks span the whole docid space, so every
    driver range overlaps them — the documented wide-span limit of the
    range algebra. Pruning evidence lives in the dense-field skew test
    below.)"""
    from prosearch_spark.corpus import zipf_corpus
    from prosearch_spark.index.artifact import (
        load_fielded_index,
        save_fielded_index,
    )
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine

    docs = zipf_corpus(spark, n_docs=6000, n_topics=8, region=512)
    docs = docs.withColumn(
        "title", F.concat_ws(" ", F.slice(F.split("content", " "), 1, 4))
    )
    path = str(tmp_path / "fzipf")
    save_fielded_index(spark, docs, path,
                       {"title": "title", "body": "content"})
    blk = FieldedBlockSearchEngine(spark, load_fielded_index(spark, path))
    got, stats = blk.topk_wand("z3_1", 10, round_to=6, min_prune_blocks=0)
    exp = [(r["doc_id"], r["score"])
           for r in blk.topk("z3_1", 10, round_to=6).collect()]
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == exp
    assert stats["blocks_total"] >= stats["blocks_decoded"] > 0


def test_fielded_wand_prunes_on_dense_skew(spark, tmp_path):
    """Fielded pruning in the shape it exists for: both fields dense in
    the query terms (narrow block spans), tf heavily skewed — light
    ranges' summed field bounds fall below the seed theta and are
    dropped before decode, exactly like the flat skew test."""
    from prosearch_spark.index.artifact import (
        load_fielded_index,
        save_fielded_index,
    )
    from prosearch_spark.query.fielded import FieldedBlockSearchEngine

    rows = []
    for i in range(2000):
        tf = 40 if i % 500 == 0 else 1  # 4 heavy docs
        body = ["needle"] * tf + ["filler", f"x{i}"]
        rows.append((i, " ".join(body)))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", F.lit("md")) \
        .withColumn("title",
                    F.concat_ws(" ", F.slice(F.split("content", " "), 1, 4)))
    path = str(tmp_path / "fskew")
    save_fielded_index(spark, docs, path,
                       {"title": "title", "body": "content"})
    blk = FieldedBlockSearchEngine(spark, load_fielded_index(spark, path))
    got, stats = blk.topk_wand("needle", 4, round_to=6, min_prune_blocks=0)
    exp = [(r["doc_id"], r["score"])
           for r in blk.topk("needle", 4, round_to=6).collect()]
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == exp
    assert [r["doc_id"] for r in got.collect()] == [0, 500, 1000, 1500]
    assert stats["blocks_decoded"] < stats["blocks_total"] / 2, stats
