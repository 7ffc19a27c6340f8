"""Dense-id assignment parity + build metrics completeness."""

from __future__ import annotations

from prosearch_spark.corpus import synth_corpus
from prosearch_spark.index.ids import assign_dense_ids, assign_dense_ids_small
from prosearch_spark.index.lineage import ResumableIndexBuild


def test_distributed_ids_match_global_window(spark):
    base = synth_corpus(spark, n_docs=300, n_repos=5, seed=3,
                        dense_ids=False).drop("doc_id")
    small = {
        (r["repo"], r["path"]): r["doc_id"]
        for r in assign_dense_ids_small(base, ["repo", "path"]).collect()
    }
    dist = {
        (r["repo"], r["path"]): r["doc_id"]
        for r in assign_dense_ids(base, ["repo", "path"],
                                  num_partitions=7).collect()
    }
    assert small == dist
    ids = sorted(dist.values())
    assert ids == list(range(len(ids)))  # dense, 0-based


def test_metrics_include_compression(spark, corpus, tmp_path):
    b = ResumableIndexBuild(spark, corpus, str(tmp_path / "m"),
                            text_col="content", n_splits=2)
    b.run()
    _, metrics = b.finalize()
    assert metrics.bytes_compressed > 0
    assert metrics.bytes_in > 0
    import json
    import os

    with open(os.path.join(str(tmp_path / "m"), "metrics.json")) as f:
        m = json.load(f)
    assert m["bytes_compressed"] == metrics.bytes_compressed
    assert m["compression_ratio"] > 0
    assert m["files_per_sec"] > 0 and m["postings_per_sec"] > 0


def test_delete_by_url(spark, corpus, tmp_path):
    from prosearch_spark.index.artifact import save_index
    from prosearch_spark.query.block_engine import BlockSearchEngine

    art = save_index(spark, corpus, str(tmp_path / "u"), text_col="content")
    eng = BlockSearchEngine(spark, art)
    victim = eng.topk("spark", 1).collect()[0]["doc_id"]
    row = corpus.filter(f"doc_id = {victim}").collect()[0]
    url = f"{row['repo']}/{row['path']}"

    urls = spark.createDataFrame([(url,)], "url string")
    art.delete_by_url(urls, corpus)
    assert victim not in [r["doc_id"]
                          for r in eng.topk("spark", 50).collect()]


def test_topk_with_count(spark, corpus):
    from prosearch_spark.index.build import build_index
    from prosearch_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, build_index(corpus, text_col="content"))
    top, total = eng.topk_with_count("spark", 5)
    assert total == eng.count("spark").collect()[0]["hits"]
    assert [r["doc_id"] for r in top.collect()] == \
        [r["doc_id"] for r in eng.topk("spark", 5).collect()]
