"""Multi-term (expanded) queries: prefix / fuzzy / regex.

Tantivy's FuzzyTermQuery / RegexQuery / prefix queries walk the term
dictionary FST with an automaton and rewrite to a disjunction over the
matching terms (the Lucene MultiTermQuery rewrite). The relational
shape of the same idea:

    term_stats (the dictionary, metadata-sized)
      -> filter by the pattern                 -- the automaton walk
      -> ORDER BY df DESC, term ASC LIMIT max_expansions
                                               -- Lucene's top-terms cap
      -> disjunctive engine over the expanded clause set, boost 1.0

Uniform boost 1.0 is deliberate: the analyzer's boost table applies to
USER tokens, never to machine-generated expansions, so expansion
bypasses analyze_query entirely (the ``clauses`` override on
topk_or / topk_wand_or).

The SQL oracle computes the SAME expansion inside the query
(term_stats is a derived view — no data values leak into the SQL
text) with the identical (df DESC, term ASC) cap rule; determinism is
by construction, not sampling. Regex patterns must be RE2-safe (no
lookaheads): Spark anchors with ``^(?:...)$``, DuckDB uses
``regexp_full_match`` (CLAUDE.md invariant).

Scale: the expansion input is term_stats, which is vocabulary-sized,
bucket-partitioned parquet — the filter + TakeOrdered cap is a
metadata job, never a postings scan. The scoring pass then reads only
the expanded terms' buckets, like any other disjunction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Lucene MultiTermQuery / FuzzyQuery default
MAX_EXPANSIONS = 50


def _cap(ts: DataFrame, cond, max_expansions: int) -> list[tuple[str, float]]:
    rows = (
        ts.filter(cond)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    return [(r["term"], 1.0) for r in rows]


def prefix_clauses(term_stats: DataFrame, prefix: str,
                   max_expansions: int = MAX_EXPANSIONS
                   ) -> list[tuple[str, float]]:
    """Terms starting with ``prefix`` (Tantivy phrase-prefix leaf /
    Lucene PrefixQuery)."""
    return _cap(term_stats, F.col("term").startswith(prefix),
                max_expansions)


def fuzzy_clauses(term_stats: DataFrame, term: str, max_dist: int = 1,
                  max_expansions: int = MAX_EXPANSIONS
                  ) -> list[tuple[str, float]]:
    """Terms within Levenshtein distance ``max_dist`` of ``term``
    (FuzzyTermQuery). A length band |len(t)-len(term)| <= max_dist
    pre-prunes before the edit-distance evaluation — the poor man's
    Levenshtein automaton (an edit can change length by at most 1)."""
    band = (F.abs(F.length("term") - F.lit(len(term))) <= max_dist)
    cond = band & (F.levenshtein(F.col("term"), F.lit(term)) <= max_dist)
    return _cap(term_stats, cond, max_expansions)


def regex_clauses(term_stats: DataFrame, pattern: str,
                  max_expansions: int = MAX_EXPANSIONS
                  ) -> list[tuple[str, float]]:
    """Terms fully matching ``pattern`` (RegexQuery semantics: the
    whole term matches, hence the anchors). RE2-safe patterns only —
    the oracle runs the same pattern through DuckDB's
    regexp_full_match."""
    return _cap(term_stats, F.col("term").rlike(f"^(?:{pattern})$"),
                max_expansions)
