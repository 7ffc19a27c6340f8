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


def test_fieldnorm_codebook_shape():
    from prosearch_spark.index.fieldnorm import (
        FIELDNORM_TABLE,
        fieldnorm_to_id,
        id_to_fieldnorm,
        quantize_dl_py,
    )

    # exact 0-40 (meta.json:13,27 shape), geometric above
    assert FIELDNORM_TABLE[:41] == list(range(41))
    assert len(FIELDNORM_TABLE) == 256
    assert all(b > a for a, b in zip(FIELDNORM_TABLE, FIELDNORM_TABLE[1:]))
    for dl in range(41):
        assert quantize_dl_py(dl) == dl
    # round-down semantics: stored norm never exceeds the true length
    for dl in [41, 45, 100, 1000, 10**6]:
        q = quantize_dl_py(dl)
        assert q <= dl
        fid = fieldnorm_to_id(dl)
        assert id_to_fieldnorm(fid) == q
        if fid < 255:
            assert id_to_fieldnorm(fid + 1) > dl
    # 1 byte of dynamic range covers any real document
    assert FIELDNORM_TABLE[-1] > 2**31


def test_quantized_index_scores_with_decoded_norms(spark):
    """Long docs (dl > 40) must score with the codebook value, not the
    exact dl, and Spark must agree with the pure-Python twin."""
    import math

    from pyspark.sql import functions as F

    from prosearch_spark.index.fieldnorm import (
        build_quantized_index,
        quantize_dl_py,
    )
    from prosearch_spark.query.bm25 import bm25_py
    from prosearch_spark.query.engine import SearchEngine

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 50 + cast(id as int) * 7), "
            "i -> CASE WHEN i = 1 AND id % 3 = 0 THEN 'needle' "
            "ELSE concat('w', pmod(id * 31 + i, 97)) END))"
        ).alias("text"),
        F.lit("md").alias("lang"),
    )
    idx = build_quantized_index(docs, text_col="text")
    got = {r["doc_id"]: r["score"]
           for r in SearchEngine(spark, idx).topk("needle", 10).collect()}
    assert got  # needle matches exist

    # python twin: recompute each matching doc's score from raw lengths
    rows = docs.collect()
    lens = {r["doc_id"]: len(r["text"].split()) for r in rows}
    matches = {r["doc_id"] for r in rows
               if "needle" in r["text"].lower().split()}
    n = len(rows)
    avgdl = sum(quantize_dl_py(l) for l in lens.values()) / n
    df = len(matches)
    # the codebook actually fires somewhere (some length is lossy)
    assert any(quantize_dl_py(l) != l for l in lens.values())
    for d in got:
        dl_q = quantize_dl_py(lens[d])
        exp = bm25_py(1, df, dl_q, n, avgdl)
        assert math.isclose(got[d], exp, rel_tol=1e-12), (d, got[d], exp)
