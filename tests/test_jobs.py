"""spark-submit entrypoint tests (jobs/): the curation job end-to-end
on a tmp corpus — funnel report, survivors parquet, mixture budget
accounting, and bit-for-bit determinism across re-runs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs.curate_job import main as curate_main


def _content(i: int) -> str:
    if i % 7 == 0:  # repetition-rule fodder
        return "spam spam spam spam spam spam spam spam"
    # varied, non-repetitive, quality-passing text (distinct tokens)
    return " ".join(f"w{(i * 31 + j * 13) % 997}" for j in range(30))


def _write_corpus(spark, path: str) -> None:
    docs = spark.createDataFrame(
        [(i, _content(i), ["en", "de", "es"][i % 3]) for i in range(300)],
        "doc_id long, content string, lang string")
    docs.write.mode("overwrite").parquet(path)


def test_curate_job_end_to_end(spark, tmp_path):
    src = str(tmp_path / "corpus")
    out = str(tmp_path / "curated")
    _write_corpus(spark, src)
    # eval set = verbatim 12-token prefixes of a few corpus docs, so
    # decontamination flags exactly those docs
    ev = spark.createDataFrame(
        [(" ".join(_content(i).split()[:12]),) for i in (3, 52, 101)],
        "text string")
    evp = str(tmp_path / "eval")
    ev.write.parquet(evp)

    rc = curate_main([
        "--input", src, "--output", out, "--eval", evp,
        "--rates", json.dumps({"en": 1.0, "de": 0.5, "es": 0.0}),
        "--default-rate", "0.0",
        "--budget-tokens", "2000",
        "--weights", json.dumps({"en": 0.7, "de": 0.3}),
    ])
    assert rc == 0

    report = json.load(open(f"{out}/report.json"))
    assert report["n_input"] == 300
    surv = spark.read.parquet(f"{out}/survivors")
    n_surv = surv.count()
    assert 0 < n_surv <= report["n_survivors"]  # mixture may cut further

    # es is rate-0 sampled and has no mixture weight: none survive
    assert surv.filter(F.col("lang") == "es").count() == 0
    # mixture accounting: per-stratum token mass within its budget
    for row in report["mixture"]:
        assert row["n_tokens"] <= row["budget"]

    # deterministic: re-running reproduces the same selection
    out2 = str(tmp_path / "curated2")
    rc = curate_main([
        "--input", src, "--output", out2, "--eval", evp,
        "--rates", json.dumps({"en": 1.0, "de": 0.5, "es": 0.0}),
        "--default-rate", "0.0",
        "--budget-tokens", "2000",
        "--weights", json.dumps({"en": 0.7, "de": 0.3}),
    ])
    assert rc == 0
    a = sorted(r["doc_id"] for r in surv.collect())
    b = sorted(r["doc_id"] for r in
               spark.read.parquet(f"{out2}/survivors").collect())
    assert a == b


def test_curate_job_without_eval_or_budget(spark, tmp_path):
    src = str(tmp_path / "corpus")
    out = str(tmp_path / "curated")
    _write_corpus(spark, src)
    rc = curate_main(["--input", src, "--output", out,
                      "--rates", json.dumps({"en": 1.0}),
                      "--default-rate", "1.0"])
    assert rc == 0
    report = json.load(open(f"{out}/report.json"))
    # no eval set -> nothing contaminated; spam docs drop on
    # quality/repetition, everything else passes rate-1.0 sampling
    assert "contaminated" not in report["drop_mix"]
    assert report["n_survivors"] == \
        spark.read.parquet(f"{out}/survivors").count()
    assert "mixture" not in report


def test_build_and_merge_jobs_end_to_end(spark, tmp_path):
    """spark-submit lineage build -> delete-by-term -> merge job: the
    committed artifact resumes, serves, tombstones, and compacts
    through the CLI entrypoints alone."""
    from jobs.build_index_job import main as build_main
    from jobs.merge_job import main as merge_main
    from prosearch_spark.index.artifact import IndexArtifact
    from prosearch_spark.query.block_engine import BlockSearchEngine

    src = str(tmp_path / "corpus")
    _write_corpus(spark, src)
    ck = str(tmp_path / "ckpt")
    rc = build_main(["--input", src, "--output", ck,
                     "--text-col", "content",
                     "--analyzer", "white_lower", "--splits", "4",
                     "--run-id", "t1"])
    assert rc == 0
    idx_path = f"{ck}/index"
    art = IndexArtifact.load(spark, idx_path)
    assert art.manifest["n_docs"] == 300
    assert art.manifest["total_dl"] > 0

    hits = BlockSearchEngine(spark, art).topk("w13", 5, round_to=6)
    before = [(r["doc_id"], r["score"]) for r in hits.collect()]
    assert before

    # tombstone the spam docs (B7: term-matched ids), compact through
    # the merge entrypoint
    art.delete_docs(
        art.postings(["spam"]).select("doc_id").distinct())
    out = str(tmp_path / "gen1")
    rc = merge_main(["--input", idx_path, "--output", out])
    assert rc == 0
    merged = IndexArtifact.load(spark, out)
    assert merged.manifest["n_docs"] < 300  # spam docs physically gone
    assert merged.deletes() is None


def test_vector_index_job_end_to_end(spark, tmp_path):
    from jobs.vector_index_job import main as vec_main
    from prosearch_spark.index.vectors import VectorArtifact
    from prosearch_spark.ops.similarity import cosine_topk

    rows = [(i, [float(((i * 7 + j * 3) % 11) - 5) for j in range(8)])
            for i in range(50)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<float>")
    src = str(tmp_path / "emb")
    emb.write.parquet(src)
    out = str(tmp_path / "vart")

    rc = vec_main(["--input", src, "--output", out,
                   "--n-centroids", "4", "--report-probe", "2"])
    assert rc == 0

    report = json.load(open(out + ".report.json"))
    assert report["n_vectors"] == 50
    assert report["n_buckets_used"] <= 4
    assert report["worst_case_probe_fraction"] >= \
        report["uniform_probe_fraction"]

    art = VectorArtifact.load(spark, out)
    q = [1.0, -2.0, 0.5, 3.0, -1.0, 0.0, 2.0, -0.5]
    got = [r["vec_id"] for r in art.topk(q, 5, n_probe=4,
                                         round_to=6).collect()]
    # n_probe = all buckets -> exact
    want = [r["vec_id"] for r in cosine_topk(emb, q, 5,
                                             round_to=6).collect()]
    assert got == want
    assert [r["rank"] for r in art.sq_topk(q, 3, n_probe=4,
                                           candidates=10).collect()] \
        == [1, 2, 3]
