"""Block-Max WAND: exact results, fewer blocks decoded."""

from __future__ import annotations

import pytest

from prosearch_spark.index.artifact import save_index
from prosearch_spark.index.build import build_index
from prosearch_spark.query.block_engine import BlockSearchEngine
from prosearch_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def big_artifact(spark, tmp_path_factory):
    """Corpus big enough for multiple blocks per term (>128 docs/term)."""
    from prosearch_spark.corpus import synth_corpus

    docs = synth_corpus(spark, n_docs=1500, n_repos=8, seed=7).cache()
    path = str(tmp_path_factory.mktemp("wandidx"))
    art = save_index(spark, docs, path, text_col="content")
    return docs, art


@pytest.mark.parametrize("q,k", [("spark", 10), ("return", 5),
                                 ("python", 10), ("the", 3)])
def test_wand_exact_vs_flat(spark, big_artifact, q, k):
    docs, art = big_artifact
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    blk = BlockSearchEngine(spark, art)
    exp = [(r["doc_id"], r["score"]) for r in flat.topk(q, k).collect()]
    got_df, stats = blk.topk_wand(q, k, min_prune_blocks=0)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert got == exp, q
    assert stats["blocks_total"] >= stats["blocks_decoded"]


def test_wand_actually_prunes(spark, tmp_path):
    """Skewed tf (few heavy docs, many light) — the case block-max
    pruning exists for: most blocks' upper bounds fall below the kth
    score and are never decoded."""
    rows = []
    for i in range(1200):
        tf = 40 if i % 400 == 0 else 1  # 3 heavy docs
        rows.append((i, " ".join(["needle"] * tf + ["filler", f"x{i}"])))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", __import__("pyspark.sql.functions",
                                       fromlist=["lit"]).lit("md"))
    art = save_index(spark, docs, str(tmp_path / "skew"), text_col="content")
    blk = BlockSearchEngine(spark, art)

    got, stats = blk.topk_wand("needle", 3, min_prune_blocks=0)
    assert [r["doc_id"] for r in got.collect()] == [0, 400, 800]
    assert stats["blocks_total"] >= 9  # 1200 postings / 128
    assert stats["blocks_decoded"] < stats["blocks_total"] / 2, stats


def test_wand_with_deletes_stays_exact(spark, big_artifact, tmp_path):
    docs, _ = big_artifact
    path = str(tmp_path / "gen0")
    art = save_index(spark, docs, path, text_col="content")
    blk = BlockSearchEngine(spark, art)
    top_before, _ = blk.topk_wand("spark", 5, min_prune_blocks=0)
    victim = top_before.collect()[0]["doc_id"]
    art.delete_docs(spark.createDataFrame([(victim,)], "doc_id long"))

    got, _ = blk.topk_wand("spark", 5, min_prune_blocks=0)
    got_ids = [r["doc_id"] for r in got.collect()]
    assert victim not in got_ids
    # unpruned block path agrees
    exp_ids = [r["doc_id"] for r in blk.topk("spark", 5).collect()]
    assert got_ids == exp_ids


def test_wand_duplicated_term_exact(spark, big_artifact):
    """'spark spark' is TWO clauses of one term: each clause scores
    (regression: an early guard used the deduped term set and halved
    the scores). WAND folds the clause boosts into one per-term weight
    w=2.0 and must stay exact."""
    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    got, stats = blk.topk_wand("spark spark", 5, min_prune_blocks=0)
    assert stats["blocks_total"] > 0
    exp = flat.topk("spark spark", 5).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]


def test_oracle_sql_handles_apostrophes():
    """Query tokens containing quotes must produce valid oracle SQL."""
    import duckdb

    from prosearch_spark.query.oracle_sql import topk_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    out = con.execute(topk_sql("don't o'reilly", 5)).df()
    assert len(out) == 0  # no matches, but no syntax error


@pytest.mark.parametrize("q,k", [("spark shuffle", 5), ("the python", 10),
                                 ("spark return the", 5)])
def test_wand_multi_term_exact(spark, big_artifact, q, k):
    """Conjunctions run real Block-Max WAND (rarest-term zipper with
    summed per-term block bounds) and must match the unpruned engine
    exactly, scores included."""
    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    # multi-clause scores sum per clause; partial-agg order makes the
    # raw sum differ in the last ulp between plans, so compare under
    # the same round-before-rank contract the oracle gate uses
    got, stats = blk.topk_wand(q, k, round_to=6, min_prune_blocks=0)
    assert stats["blocks_total"] >= stats["blocks_final"]
    exp = flat.topk(q, k, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp], q


def test_wand_multi_term_prunes_on_skew(spark, tmp_path):
    """Two-term conjunction over a skewed corpus: a few doc ranges hold
    the heavy (needle, haystack) co-occurrences; every other rarest
    block's summed bound falls below the kth seed score and is skipped
    before decode."""
    rows = []
    for i in range(2000):
        heavy = i % 500 == 0  # 4 heavy docs
        tf = 40 if heavy else 1
        body = ["needle"] * tf + ["haystack"] * (tf if heavy else 1)
        rows.append((i, " ".join(body + ["filler", f"x{i}"])))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", __import__("pyspark.sql.functions",
                                       fromlist=["lit"]).lit("md"))
    art = save_index(spark, docs, str(tmp_path / "skew2"),
                     text_col="content")
    blk = BlockSearchEngine(spark, art)
    got, stats = blk.topk_wand("needle haystack", 4, min_prune_blocks=0)
    assert [r["doc_id"] for r in got.collect()] == [0, 500, 1000, 1500]
    assert stats["blocks_decoded"] < stats["blocks_total"], stats
    # exactness against the unpruned path
    exp = blk.topk("needle haystack", 4).collect()
    assert [r["doc_id"] for r in got.collect()] == \
        [r["doc_id"] for r in exp]


def test_wand_prunes_on_zipf_vocabulary(spark, tmp_path):
    """On a realistic long-tail corpus (Zipf vocab + doc-id-local
    topics), the majority of a topical term's blocks are background
    mentions whose bounds fall below the seed threshold — the pruning
    the driver bench reports (VERDICT r01 item 3)."""
    from prosearch_spark.corpus import zipf_corpus

    docs = zipf_corpus(spark, n_docs=6000, n_topics=8, region=512)
    art = save_index(spark, docs, str(tmp_path / "zipf"),
                     text_col="content")
    blk = BlockSearchEngine(spark, art)
    got, stats = blk.topk_wand("z3_1", 10, round_to=6, min_prune_blocks=0)
    # exact vs the unpruned engine
    exp = blk.topk("z3_1", 10, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]
    pruned = 1 - stats["blocks_decoded"] / stats["blocks_total"]
    assert pruned >= 0.4, stats


def test_wand_multi_term_with_deletes(spark, big_artifact, tmp_path):
    docs, _ = big_artifact
    art = save_index(spark, docs, str(tmp_path / "gen0d"),
                     text_col="content")
    blk = BlockSearchEngine(spark, art)
    top_before, _ = blk.topk_wand("spark shuffle", 5)
    victim = top_before.collect()[0]["doc_id"]
    art.delete_docs(spark.createDataFrame([(victim,)], "doc_id long"))
    got, _ = blk.topk_wand("spark shuffle", 5)
    got_ids = [r["doc_id"] for r in got.collect()]
    assert victim not in got_ids
    exp_ids = [r["doc_id"] for r in blk.topk("spark shuffle", 5).collect()]
    assert got_ids == exp_ids


def test_wand_fewer_than_k_results(spark, big_artifact):
    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    got, _ = blk.topk_wand("nonexistentterm", 10)
    assert got.count() == 0

def test_wand_seed_cap_falls_back_exact(spark, big_artifact, monkeypatch):
    """When the seed doubling would exceed the driver-side range cap,
    WAND hands off to the exact range-pruned engine instead of
    collecting unbounded block metadata."""
    import prosearch_spark.query.block_engine as be

    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    # k above the total conjunctive match count ('spark shuffle' has
    # ~985 matches at 1500 docs) keeps the seed short of k, forcing the
    # doubling loop; cap=1 then trips the fallback on the first double
    monkeypatch.setattr(be, "SEED_BLOCK_CAP", 1)
    got, stats = blk.topk_wand("spark shuffle", 1400, min_prune_blocks=0)
    assert stats.get("seed_capped") is True, stats
    exp = blk.topk("spark shuffle", 1400).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]


def test_wand_first_collect_respects_cap(spark, big_artifact, monkeypatch):
    """The cap bounds the FIRST seed collect too: a huge k must not
    pull an unbounded range list to the driver (r2 review)."""
    import prosearch_spark.query.block_engine as be

    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    monkeypatch.setattr(be, "SEED_BLOCK_CAP", 2)
    # k so large that uncapped initial B would be k/64 >> cap
    got, stats = blk.topk_wand("spark", 100000, min_prune_blocks=0)
    # single term with few blocks: cap=2 < n_rarest -> either the seed
    # covered everything under the cap or the fallback fired; both are
    # exact
    exp = blk.topk("spark", 100000).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]


def test_wand_short_circuit_small_corpus(spark, big_artifact):
    """Default cost cutoff: a corpus with fewer blocks than
    WAND_MIN_PRUNE_BLOCKS skips the seed/bounds ladder entirely (the
    r02 q_wand_single regression fix) and stays exact."""
    docs, art = big_artifact
    from prosearch_spark.index.build import build_index

    blk = BlockSearchEngine(spark, art)
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    got, stats = blk.topk_wand("spark shuffle", 5, round_to=6)
    assert stats.get("short_circuit") is True, stats
    assert stats["blocks_decoded"] == stats["blocks_total"]
    exp = flat.topk("spark shuffle", 5, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]


def test_wand_bounds_skip_when_savings_small(spark, tmp_path):
    """With the ladder forced on (min_prune_blocks small but nonzero),
    a seed that already covers most blocks skips the bounds pass and
    decodes the remainder outright — still exact."""
    rows = []
    for i in range(1200):
        tf = 40 if i % 400 == 0 else 1
        rows.append((i, " ".join(["needle"] * tf + ["filler", f"x{i}"])))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", __import__("pyspark.sql.functions",
                                       fromlist=["lit"]).lit("md"))
    art = save_index(spark, docs, str(tmp_path / "skewbs"),
                     text_col="content")
    blk = BlockSearchEngine(spark, art)
    got, stats = blk.topk_wand("needle", 3, min_prune_blocks=8)
    # ~10 blocks total, seed of 4: remainder < 8 -> bounds skipped
    assert stats.get("bounds_skipped") is True, stats
    assert [r["doc_id"] for r in got.collect()] == [0, 400, 800]


def test_wand_filtered_matches_topk_filtered(spark, tmp_path):
    """Filtered WAND (fast-field predicate under the pruning ladder)
    must equal topk_filtered exactly — theta from filtered seed scores
    stays sound because block bounds upper-bound the unfiltered score."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(1200):
        tf = 40 if i % 400 == 0 else 1
        rows.append((i, " ".join(["needle"] * tf + ["filler", f"x{i}"])))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", F.lit("md")) \
        .withColumn("parity", F.expr("cast(doc_id % 2 as int)"))
    art = save_index(spark, docs, str(tmp_path / "fwand"),
                     text_col="content", fast_fields={"parity": "parity"})
    blk = BlockSearchEngine(spark, art)
    pred = "parity = 0"
    got, stats = blk.topk_wand("needle", 3, round_to=6,
                               min_prune_blocks=0, predicate=pred)
    exp = blk.topk_filtered("needle", pred, 3, round_to=6)
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp.collect()]
    # the filter keeps even ids only; heavy docs 0/400/800 all qualify
    assert [r["doc_id"] for r in got.collect()] == [0, 400, 800]
    assert stats["blocks_decoded"] < stats["blocks_total"], stats


def test_wand_filtered_excludes_heavy_docs(spark, tmp_path):
    """When the predicate excludes the heavy docs, theta drops and the
    result re-ranks among qualifying docs only — still exact vs the
    unpruned filtered engine."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(1200):
        tf = 40 if i % 400 == 0 else 1
        rows.append((i, " ".join(["needle"] * tf + ["filler", f"x{i}"])))
    docs = spark.createDataFrame(rows, "doc_id long, content string") \
        .withColumn("lang", F.lit("md")) \
        .withColumn("parity", F.expr("cast(doc_id % 2 as int)"))
    art = save_index(spark, docs, str(tmp_path / "fwand2"),
                     text_col="content", fast_fields={"parity": "parity"})
    blk = BlockSearchEngine(spark, art)
    pred = "parity = 1"  # heavy docs (0,400,800) are all even -> excluded
    got, _ = blk.topk_wand("needle", 5, round_to=6,
                           min_prune_blocks=0, predicate=pred)
    exp = blk.topk_filtered("needle", pred, 5, round_to=6)
    got_rows = got.collect()
    assert all(r["doc_id"] % 2 == 1 for r in got_rows)
    assert [(r["doc_id"], r["score"]) for r in got_rows] == \
        [(r["doc_id"], r["score"]) for r in exp.collect()]


# -- disjunctive (match-ANY) Block-Max WAND -----------------------------------

@pytest.mark.parametrize("q,k", [("spark python", 10), ("the return", 5),
                                 ("spark", 10), ("spark spark python", 7)])
def test_wand_or_exact_vs_flat(spark, big_artifact, q, k):
    """Disjunctive WAND == flat disjunctive engine, scores included
    (docs matching a strict subset of clauses must appear, scored by
    their matched clauses only)."""
    docs, art = big_artifact
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    blk = BlockSearchEngine(spark, art)
    exp = [(r["doc_id"], r["score"])
           for r in flat.topk_or(q, k, round_to=6).collect()]
    got_df, stats = blk.topk_wand_or(q, k, round_to=6, min_prune_blocks=0)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert got == exp, q
    assert stats["blocks_total"] >= stats["blocks_decoded"]


def test_wand_or_includes_partial_matchers(spark, big_artifact):
    """OR semantics proper: the disjunction of a hot and a nonexistent
    term equals the single-term result (conjunction would be empty)."""
    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    only, _ = blk.topk_wand_or("spark zzznosuchterm", 10, round_to=6,
                               min_prune_blocks=0)
    single, _ = blk.topk_wand("spark", 10, round_to=6, min_prune_blocks=0)
    assert [(r["doc_id"], r["score"]) for r in only.collect()] == \
        [(r["doc_id"], r["score"]) for r in single.collect()]
    assert blk.topk("spark zzznosuchterm", 10, round_to=6).count() == 0


def test_wand_or_prunes_on_zipf_vocabulary(spark, tmp_path):
    """The canonical block-max WAND case (Ding & Suel 2011): topical
    disjunction over a long-tail vocabulary prunes background blocks
    while staying exact vs the flat disjunctive engine."""
    from prosearch_spark.corpus import zipf_corpus

    docs = zipf_corpus(spark, n_docs=6000, n_topics=8, region=512)
    art = save_index(spark, docs, str(tmp_path / "zipfor"),
                     text_col="content")
    blk = BlockSearchEngine(spark, art)
    got, stats = blk.topk_wand_or("z3_1 z3_2", 10, round_to=6,
                                  min_prune_blocks=0)
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    exp = flat.topk_or("z3_1 z3_2", 10, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]
    pruned = 1 - stats["blocks_decoded"] / stats["blocks_total"]
    assert pruned >= 0.3, stats


def test_wand_or_short_circuit_and_empty(spark, big_artifact):
    docs, art = big_artifact
    blk = BlockSearchEngine(spark, art)
    out, stats = blk.topk_wand_or("spark python", 5, round_to=6)
    assert stats.get("short_circuit") is True  # small corpus, cutoff
    exp = SearchEngine(spark, build_index(docs, text_col="content")) \
        .topk_or("spark python", 5, round_to=6).collect()
    assert [(r["doc_id"], r["score"]) for r in out.collect()] == \
        [(r["doc_id"], r["score"]) for r in exp]
    empty, st0 = blk.topk_wand_or("zzznope", 5, round_to=6)
    assert empty.count() == 0 and st0["blocks_total"] == 0


@pytest.mark.parametrize("m", [1, 2, 3])
def test_wand_or_min_should_match(spark, big_artifact, m):
    """minimum_should_match m-of-n: same OR ladder (bounds dominate
    any clause subset), final filter relaxed — matches the flat twin
    at every m; m == n equals the conjunction."""
    docs, art = big_artifact
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    blk = BlockSearchEngine(spark, art)
    q = "spark python return"
    exp = [(r["doc_id"], r["score"])
           for r in flat.topk_or(q, 8, round_to=6, min_match=m).collect()]
    got_df, _ = blk.topk_wand_or(q, 8, round_to=6, min_prune_blocks=0,
                                 min_match=m)
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert got == exp, m
    if m == 3:
        conj = [(r["doc_id"], r["score"])
                for r in flat.topk(q, 8, round_to=6).collect()]
        assert got == conj


def test_topk_not_excludes_and_matches_flat(spark, big_artifact):
    """must_not: block path == flat path; excluded docs vanish, and
    with no excluded term present the result equals plain topk."""
    docs, art = big_artifact
    flat = SearchEngine(spark, build_index(docs, text_col="content"))
    blk = BlockSearchEngine(spark, art)
    a = [(r["doc_id"], r["score"])
         for r in blk.topk_not("spark", "python", 10, round_to=6).collect()]
    b = [(r["doc_id"], r["score"])
         for r in flat.topk_not("spark", "python", 10, round_to=6).collect()]
    assert a == b and len(a) > 0
    # every excluded doc is really gone
    py_docs = {r["doc_id"] for r in flat.match_scan("python").collect()}
    assert not ({d for d, _ in a} & py_docs)
    # no-op exclusion == plain topk
    plain = [(r["doc_id"], r["score"])
             for r in flat.topk("spark", 10, round_to=6).collect()]
    noex = [(r["doc_id"], r["score"])
            for r in flat.topk_not("spark", "zzznope", 10,
                                   round_to=6).collect()]
    assert noex == plain
