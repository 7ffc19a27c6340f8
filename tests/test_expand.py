"""Prefix / fuzzy / regex term expansion (Tantivy FuzzyTermQuery /
RegexQuery / prefix parity via the MultiTermQuery rewrite)."""

from __future__ import annotations

import pytest

from prosearch_spark.index.artifact import save_index
from prosearch_spark.index.build import build_index
from prosearch_spark.query.block_engine import BlockSearchEngine
from prosearch_spark.query.engine import SearchEngine
from prosearch_spark.query.expand import (
    fuzzy_clauses,
    prefix_clauses,
    regex_clauses,
)


@pytest.fixture(scope="module")
def eng(spark, corpus):
    return SearchEngine(spark, build_index(corpus, text_col="content"))


def test_prefix_expansion_terms(eng):
    terms = {t for t, b in prefix_clauses(eng.index.term_stats, "s")}
    assert terms and all(t.startswith("s") for t in terms)
    assert all(b == 1.0 for _, b in
               prefix_clauses(eng.index.term_stats, "s"))


def test_fuzzy_expansion_within_distance(eng):
    cl = fuzzy_clauses(eng.index.term_stats, "spark", max_dist=1)
    assert ("spark", 1.0) in cl
    # distance-2 term must not appear at max_dist=1
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    assert all(lev(t, "spark") <= 1 for t, _ in cl)


def test_regex_expansion_full_match_only(eng):
    cl = regex_clauses(eng.index.term_stats, "sp.rk|pyth.n")
    terms = {t for t, _ in cl}
    assert "spark" in terms
    import re

    assert all(re.fullmatch("sp.rk|pyth.n", t) for t in terms)


def test_expansion_cap_rule_is_df_then_term(eng):
    cl = prefix_clauses(eng.index.term_stats, "", max_expansions=5)
    assert len(cl) == 5
    dfs = {r["term"]: r["df"] for r in eng.index.term_stats.collect()}
    ranked = sorted(dfs, key=lambda t: (-dfs[t], t))[:5]
    assert [t for t, _ in cl] == ranked


def test_expanded_disjunction_flat_vs_wand(spark, corpus, tmp_path):
    """The expanded clause set scores identically through the flat
    disjunctive engine and the WAND-OR ladder over a committed
    artifact (clauses override, uniform boost — no analyzer boosts)."""
    eng = SearchEngine(spark, build_index(corpus, text_col="content"))
    cl = prefix_clauses(eng.index.term_stats, "s")
    flat = eng.topk_or("", 10, round_to=6, clauses=cl).collect()
    art = save_index(spark, corpus, str(tmp_path / "exp"),
                     text_col="content")
    got, _ = BlockSearchEngine(spark, art).topk_wand_or(
        "", 10, round_to=6, min_prune_blocks=0, clauses=cl)
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == \
        [(r["doc_id"], r["score"]) for r in flat]


def test_empty_expansion_is_empty_result(eng):
    cl = prefix_clauses(eng.index.term_stats, "zzznope")
    assert cl == []
    assert eng.topk_or("", 10, round_to=6, clauses=cl).count() == 0
