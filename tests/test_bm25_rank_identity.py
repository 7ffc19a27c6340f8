"""End-to-end rank-identity: Spark engine vs brute-force Python oracle
(FIXTURES.md §2-3; the acceptance gate of BASELINE.json:north_rule)."""

from __future__ import annotations

import pytest

from prosearch_spark.index.build import build_index
from prosearch_spark.oracle import build_oracle_index, topk as oracle_topk
from prosearch_spark.query.engine import SearchEngine

# fixed query set: single / AND / boosted(raw-case-sensitive) / mixed
# case / hot term / zero-match / duplicate clause (FIXTURES.md §2)
QUERY_SET = [
    "spark",
    "python",          # in BOOST_TERMS -> 2.5
    "Python",          # NOT boosted (case-sensitive raw match)
    "spark shuffle",
    "return the",      # hot terms
    "parsequerystring",
    "spark spark",
    "nonexistenterm",
    "bm25 varint delta",
]


@pytest.fixture(scope="module")
def engine_and_oracle(spark, corpus, corpus_rows):
    idx = build_index(corpus, text_col="content")
    eng = SearchEngine(spark, idx)
    oidx = build_oracle_index(corpus_rows, {"body": "content"})
    return eng, oidx


@pytest.mark.parametrize("q", QUERY_SET)
def test_rank_identical_topk(engine_and_oracle, q):
    eng, oidx = engine_and_oracle
    got = eng.topk(q, 10).collect()
    exp = oracle_topk(oidx, q, 10, fields=("body",), field_boosts={"body": 1.0})
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, score) in zip(got, exp):
        assert r["score"] == pytest.approx(score, rel=1e-9)


@pytest.mark.parametrize("q", ["spark", "spark shuffle", "nonexistenterm"])
def test_count_matches_oracle(engine_and_oracle, q):
    eng, oidx = engine_and_oracle
    got = eng.count(q).collect()[0]["hits"]
    exp = len(oracle_topk(oidx, q, 10**9, fields=("body",),
                          field_boosts={"body": 1.0}))
    assert got == exp


def test_boost_changes_score_not_set(engine_and_oracle):
    """Term boost multiplies scores uniformly for single-term queries:
    same docs, same order, 2.5x score (serve.rs:388-405)."""
    eng, _ = engine_and_oracle
    plain = eng.topk("Python", 10).collect()   # raw 'Python' not in set
    boosted = eng.topk("python", 10).collect()  # raw 'python' boosted
    assert [r["doc_id"] for r in plain] == [r["doc_id"] for r in boosted]
    for p, b in zip(plain, boosted):
        assert b["score"] == pytest.approx(2.5 * p["score"], rel=1e-9)


def test_conjunction_semantics(engine_and_oracle, corpus_rows):
    """AND-by-default: every hit contains every query term (Q2)."""
    eng, _ = engine_and_oracle
    hits = {r["doc_id"] for r in eng.match_scan("spark shuffle").collect()}
    from prosearch_spark.analyzer import white_lower_py

    for d in corpus_rows:
        toks = set(white_lower_py(d["content"]))
        expected = "spark" in toks and "shuffle" in toks
        assert (d["doc_id"] in hits) == expected


def test_search_after_continues_the_ranking(spark, corpus):
    """Pages seeded by the previous page's last cursor tile the global
    order: page1 + page2 == top-2k, disjoint, in order."""
    from prosearch_spark.index.build import build_index
    from prosearch_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, build_index(corpus, text_col="content"))
    top20 = [(r["doc_id"], r["score"])
             for r in eng.topk("spark", 20, round_to=6).collect()]
    p1 = eng.topk("spark", 10, round_to=6).collect()
    last = p1[-1]
    p2 = eng.topk_after("spark", 10, round_to=6,
                        after=(last["score"], last["doc_id"])).collect()
    got = [(r["doc_id"], r["score"]) for r in p1] + \
          [(r["doc_id"], r["score"]) for r in p2]
    assert got == top20
    assert [r["rank"] for r in p2] == list(range(1, len(p2) + 1))


def test_terms_stats_agg_buckets(spark, corpus):
    """Per-bucket stats equal the single-bucket stats restricted to
    that bucket (integer column: exact sums, one division)."""
    from pyspark.sql import functions as F

    from prosearch_spark.index.build import build_index
    from prosearch_spark.query.engine import SearchEngine

    docs = corpus.withColumn("n_chars", F.length("content"))
    eng = SearchEngine(spark, build_index(docs, text_col="content"))
    rows = {r["lang"]: r for r in
            eng.terms_stats_agg("spark", docs, "lang", "n_chars")
            .collect()}
    assert rows
    for lang, r in rows.items():
        sub = docs.filter(F.col("lang") == lang).join(
            eng.match_scan("spark"), "doc_id")
        agg = sub.agg(F.count("*").alias("c"),
                      F.sum("n_chars").alias("s")).collect()[0]
        assert r["count"] == agg["c"] and r["sum"] == agg["s"]
        assert r["min"] <= r["avg"] <= r["max"]
