"""Index-build invariants (SURVEY.md §5 implication (f))."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from prosearch_spark.analyzer import white_lower_py
from prosearch_spark.index.build import build_fielded_index, build_index


def test_postings_invariants(spark, corpus, corpus_rows):
    idx = build_index(corpus, text_col="content")
    postings = idx.postings.collect()
    term_stats = {r["term"]: r["df"] for r in idx.term_stats.collect()}
    stats = idx.stats.collect()[0]

    # unique (term, doc_id)
    keys = [(r["term"], r["doc_id"]) for r in postings]
    assert len(keys) == len(set(keys))

    # df == number of posting rows per term
    df_from_postings = Counter(r["term"] for r in postings)
    assert dict(df_from_postings) == term_stats

    # dl == sum(tf) per doc, consistent across every row of the doc
    by_doc: dict[int, list] = {}
    for r in postings:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        dl = rows[0]["dl"]
        assert all(r["dl"] == dl for r in rows)
        assert sum(r["tf"] for r in rows) == dl

    # tf/dl match a trivial Python recount
    expected = {}
    for d in corpus_rows:
        c = Counter(white_lower_py(d["content"]))
        for t, n in c.items():
            expected[(t, d["doc_id"])] = n
    got = {(r["term"], r["doc_id"]): r["tf"] for r in postings}
    assert got == expected

    # corpus stats
    assert stats["n_docs"] == len(corpus_rows)
    total = sum(len(white_lower_py(d["content"])) for d in corpus_rows)
    assert abs(stats["avgdl"] - total / len(corpus_rows)) < 1e-9


def test_fielded_index_title_tf_is_one(spark, corpus):
    idx = build_fielded_index(corpus, {"title": "path", "body": "content"})
    title_tfs = (
        idx.postings.filter(F.col("field") == "title")
        .select("tf").distinct().collect()
    )
    assert [r["tf"] for r in title_tfs] == [1]
    # body keeps real tf (some tf > 1 exists in the synthetic corpus)
    assert (
        idx.postings.filter((F.col("field") == "body") & (F.col("tf") > 1)).count()
        > 0
    )


def test_fielded_index_per_field_stats(spark, corpus):
    idx = build_fielded_index(corpus, {"title": "path", "body": "content"})
    stats = {r["field"]: r for r in idx.stats.collect()}
    assert set(stats) == {"title", "body"}
    assert stats["body"]["avgdl"] > stats["title"]["avgdl"]


def test_code_analyzer_index(spark, corpus, corpus_rows):
    from prosearch_spark.analyzer import analyze_code

    idx = build_index(corpus, text_col="content", analyzer="code")
    got = {(r["term"], r["doc_id"]): r["tf"] for r in idx.postings.collect()}
    expected = {}
    for d in corpus_rows:
        c = Counter(analyze_code(d["content"], d["lang"]))
        for t, n in c.items():
            expected[(t, d["doc_id"])] = n
    assert got == expected
