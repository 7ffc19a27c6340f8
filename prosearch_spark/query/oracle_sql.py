"""ANSI-SQL (DuckDB-dialect) oracle generators.

For every oracle-checkable operator, these functions emit a SQL string
that recomputes the result FROM SCRATCH on the raw ``documents`` view
(columns: doc_id, text, lang, source, n_chars) — an independent
implementation of the same semantics, used by the driver's DuckDB
correctness gate and by tools/check_oracle.py.

Tokenization mirror of analyzer.white_lower_tokens: DuckDB
``string_split_regex(lower(text), '\\s+')`` — RE2 ``\\s`` and Java
``\\s`` agree on ASCII whitespace, and the corpus is ASCII.

Scoring mirror: prosearch_spark.query.bm25.SCORE_EXPR verbatim.
"""

from __future__ import annotations

from prosearch_spark.analyzer import analyze_query
from prosearch_spark.query.bm25 import MLT_TERM_EXPR, SCORE_EXPR

# shared CTE prelude: token stream, tf, dl-denormalized postings,
# term_stats, corpus stats — the SQL twin of index/build.py.
INDEX_CTES = """
toks AS (
    SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
    ) WHERE term <> ''
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf
    FROM toks GROUP BY doc_id, term
),
postings AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf
),
term_stats AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
stats AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
)
"""


def postings_sql(limit_terms: list[str] | None = None) -> str:
    where = ""
    if limit_terms:
        inlist = ", ".join(_sql_str(t) for t in sorted(limit_terms))
        where = f"WHERE term IN ({inlist})"
    return f"WITH {INDEX_CTES} SELECT term, doc_id, tf, dl FROM postings {where}"


def term_stats_sql(min_df: int = 0) -> str:
    where = f"WHERE df >= {min_df}" if min_df else ""
    return f"WITH {INDEX_CTES} SELECT term, df FROM term_stats {where}"


def doc_stats_sql() -> str:
    return (
        f"WITH {INDEX_CTES} "
        "SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id"
    )


def corpus_stats_sql() -> str:
    return f"WITH {INDEX_CTES} SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats"


def _sql_str(t: str) -> str:
    """SQL string literal (single quotes doubled — queries may contain
    apostrophes; DuckDB standard strings don't process backslashes)."""
    return "'" + t.replace("'", "''") + "'"


def _query_clause_cte(q: str) -> tuple[str, int]:
    clauses = analyze_query(q)
    vals = ", ".join(f"({_sql_str(t)}, {b!r}::DOUBLE)" for t, b in clauses)
    cte = f"qterms(term, boost) AS (SELECT * FROM (VALUES {vals}))"
    return cte, len(clauses)


_QUALIFY = {
    "boost": "q.boost",
    "n_docs": "stats.n_docs",
    "avgdl": "stats.avgdl",
    "df": "t.df",
    "tf": "p.tf",
    "dl": "p.dl",
}
_QUALIFY_RE = __import__("re").compile(
    r"\b(n_docs|avgdl|boost|df|tf|dl)\b"
)


def _qualify(expr: str) -> str:
    """Rewrite SCORE_EXPR's bare column names to joined-table aliases
    (word-boundary-safe: ``dl`` must not touch ``avgdl``)."""
    return _QUALIFY_RE.sub(lambda m: _QUALIFY[m.group(1)], expr)


def _scored_docs_cte_qualified(q: str, conjunctive: bool = True,
                               min_match: int = 1) -> tuple[str, int]:
    qcte, n_clauses = _query_clause_cte(q)
    score = _qualify(SCORE_EXPR)
    if conjunctive:
        having = f"    HAVING count(*) = {n_clauses}\n"
    elif min_match > 1:
        having = f"    HAVING count(*) >= {min_match}\n"
    else:
        having = ""
    cte = (
        f"{INDEX_CTES}, {qcte},\n"
        "scored AS (\n"
        f"    SELECT p.doc_id AS doc_id, {score} AS s\n"
        "    FROM qterms q\n"
        "    JOIN postings p ON p.term = q.term\n"
        "    JOIN term_stats t ON t.term = q.term\n"
        "    CROSS JOIN stats\n"
        "),\n"
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score, count(*) AS nmatch\n"
        "    FROM scored GROUP BY doc_id\n"
        f"{having}"
        ")"
    )
    return cte, n_clauses


def _rank_tail(cte: str, k: int, round_to: int,
               from_name: str = "docs_scored") -> str:
    return (
        f"WITH {cte},\n"
        "rounded AS (\n"
        f"    SELECT doc_id, round(score, {round_to}) AS score FROM {from_name}\n"
        "),\n"
        "ranked AS (\n"
        "    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "           doc_id, score\n"
        "    FROM rounded\n"
        ")\n"
        f"SELECT rank, doc_id, score FROM ranked WHERE rank <= {k} ORDER BY rank"
    )


def topk_sql(q: str, k: int = 10, round_to: int = 6) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return _rank_tail(cte, k, round_to)


def multi_topk_sql(queries: list[str], k: int = 10,
                   round_to: int = 6,
                   min_match: int | None = None) -> str:
    """Batched multi-query oracle — twin of
    SearchEngine/BlockSearchEngine.multi_topk: one (query_id, term,
    boost) relation joined against the shared postings CTE, per-query
    conjunction via the clause count, per-query round-before-rank with
    the (score DESC, doc_id ASC) tie-break. A query that analyzes to
    zero clauses contributes no rows (it is simply absent from the
    VALUES lists). ``min_match=None`` keeps the default conjunction;
    an int relaxes to should-clause semantics (twin of multi_topk_or:
    match >= min_match clauses)."""
    parsed = [(qi, analyze_query(q)) for qi, q in enumerate(queries)]
    rows = [(qi, t, b) for qi, cl in parsed for t, b in cl]
    if not rows:
        return ("SELECT NULL::INT AS query_id, NULL::INT AS rank, "
                "NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE false")
    score = _qualify(SCORE_EXPR)
    qvals = ", ".join(f"({qi}, {_sql_str(t)}, {b!r}::DOUBLE)"
                      for qi, t, b in rows)
    nvals = ", ".join(f"({qi}, {len(cl)})" for qi, cl in parsed if cl)
    return (
        f"WITH {INDEX_CTES},\n"
        f"qterms(query_id, term, boost) AS (SELECT * FROM (VALUES {qvals})),\n"
        f"qn(query_id, n_clauses) AS (SELECT * FROM (VALUES {nvals})),\n"
        "scored AS (\n"
        f"    SELECT q.query_id, p.doc_id AS doc_id, {score} AS s\n"
        "    FROM qterms q\n"
        "    JOIN postings p ON p.term = q.term\n"
        "    JOIN term_stats t ON t.term = q.term\n"
        "    CROSS JOIN stats\n"
        "),\n"
        "docs_scored AS (\n"
        "    SELECT query_id, doc_id, sum(s) AS score, count(*) AS nmatch\n"
        "    FROM scored GROUP BY query_id, doc_id\n"
        "),\n"
        "kept AS (\n"
        "    SELECT d.query_id, d.doc_id,\n"
        f"           round(d.score, {round_to}) AS score\n"
        "    FROM docs_scored d JOIN qn USING (query_id)\n"
        + ("    WHERE d.nmatch = qn.n_clauses\n" if min_match is None
           else (f"    WHERE d.nmatch >= {min_match}\n"
                 if min_match > 1 else ""))
        + "),\n"
        "ranked AS (\n"
        "    SELECT query_id,\n"
        "           row_number() OVER (PARTITION BY query_id\n"
        "               ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "           doc_id, score\n"
        "    FROM kept\n"
        ")\n"
        f"SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}\n"
        "ORDER BY query_id, rank"
    )


def expanded_topk_sql(where_sql: str, k: int = 10, round_to: int = 6,
                      max_expansions: int = 50) -> str:
    """Prefix/fuzzy/regex oracle: qterms comes from the DERIVED
    term_stats view filtered by ``where_sql`` and capped with the
    Lucene rule (df DESC, term ASC LIMIT max_expansions) — the same
    expansion query/expand.py runs on the Spark side; uniform boost
    1.0; disjunctive scoring (no HAVING)."""
    score = _qualify(SCORE_EXPR)
    cte = (
        f"{INDEX_CTES},\n"
        "qterms AS (\n"
        f"    SELECT term, 1.0::DOUBLE AS boost FROM term_stats\n"
        f"    WHERE {where_sql}\n"
        f"    ORDER BY df DESC, term ASC LIMIT {max_expansions}\n"
        "),\n"
        "scored AS (\n"
        f"    SELECT p.doc_id AS doc_id, {score} AS s\n"
        "    FROM qterms q\n"
        "    JOIN postings p ON p.term = q.term\n"
        "    JOIN term_stats t ON t.term = q.term\n"
        "    CROSS JOIN stats\n"
        "),\n"
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score\n"
        "    FROM scored GROUP BY doc_id\n"
        ")"
    )
    return _rank_tail(cte, k, round_to)


def topk_not_sql(q: str, exclude: str, k: int = 10,
                 round_to: int = 6) -> str:
    """must_not oracle: the conjunctive CTE anti-joined with docs
    containing any analyzed term of ``exclude`` — twin of
    SearchEngine.topk_not / BlockSearchEngine.topk_not. An exclude
    that analyzes to ZERO terms is a no-op on the engine side, so the
    twin degrades to plain topk_sql (an empty IN () list would be a
    DuckDB syntax error — r3 ADVICE finding)."""
    ex = sorted({t for t, _ in analyze_query(exclude)})
    if not ex:
        return topk_sql(q, k, round_to)
    cte, _ = _scored_docs_cte_qualified(q)
    inlist = ", ".join(_sql_str(t) for t in ex)
    cte += (
        ",\n"
        "docs_kept AS (\n"
        "    SELECT d.doc_id, d.score FROM docs_scored d\n"
        "    WHERE NOT EXISTS (SELECT 1 FROM postings p\n"
        f"                      WHERE p.term IN ({inlist})\n"
        "                        AND p.doc_id = d.doc_id)\n"
        ")"
    )
    return _rank_tail(cte, k, round_to, from_name="docs_kept")


def topk_or_sql(q: str, k: int = 10, round_to: int = 6,
                min_match: int = 1) -> str:
    """Disjunctive (match >= min_match, default ANY) top-k: the
    conjunction CTE with the clause-count HAVING relaxed — twin of
    SearchEngine.topk_or."""
    cte, _ = _scored_docs_cte_qualified(q, conjunctive=False,
                                        min_match=min_match)
    return _rank_tail(cte, k, round_to)


def more_like_this_sql(seed_doc_id: int, k: int = 10, max_terms: int = 8,
                       min_df: int = 2, round_to: int = 6) -> str:
    """MoreLikeThis oracle — twin of SearchEngine.more_like_this: the
    seed doc's top ``max_terms`` terms by tf x BM25-idf (MLT_TERM_EXPR
    verbatim, 6dp grid, ties -> term ASC, df >= min_df), then the
    standard disjunctive BM25 ranking over exactly those terms with
    uniform boost 1.0 and the seed doc excluded."""
    mexpr = _qualify(MLT_TERM_EXPR)
    score = _qualify(SCORE_EXPR)
    cte = (
        f"{INDEX_CTES},\n"
        "mltsel AS (\n"
        f"    SELECT p.term AS term, {mexpr} AS mscore\n"
        "    FROM postings p\n"
        "    JOIN term_stats t ON t.term = p.term\n"
        "    CROSS JOIN stats\n"
        f"    WHERE p.doc_id = {seed_doc_id} AND t.df >= {min_df}\n"
        "),\n"
        "qterms AS (\n"
        "    SELECT term, 1.0::DOUBLE AS boost FROM (\n"
        "        SELECT term, mscore FROM mltsel\n"
        f"        ORDER BY mscore DESC, term ASC LIMIT {max_terms}\n"
        "    )\n"
        "),\n"
        "scored AS (\n"
        f"    SELECT p.doc_id AS doc_id, {score} AS s\n"
        "    FROM qterms q\n"
        "    JOIN postings p ON p.term = q.term\n"
        "    JOIN term_stats t ON t.term = q.term\n"
        "    CROSS JOIN stats\n"
        f"    WHERE p.doc_id <> {seed_doc_id}\n"
        "),\n"
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score, count(*) AS nmatch\n"
        "    FROM scored GROUP BY doc_id\n"
        ")"
    )
    return _rank_tail(cte, k, round_to)


def count_sql(q: str) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return f"WITH {cte} SELECT count(*)::BIGINT AS hits FROM docs_scored"


def match_scan_sql(q: str) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return f"WITH {cte} SELECT doc_id FROM docs_scored"


def terms_agg_sql(q: str, group_col: str, size: int = 10) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte}\n"
        f"SELECT d.{group_col} AS {group_col}, count(*)::BIGINT AS doc_count\n"
        "FROM documents d JOIN docs_scored m USING (doc_id)\n"
        f"GROUP BY d.{group_col}\n"
        f"ORDER BY doc_count DESC, {group_col} ASC LIMIT {size}"
    )


def fielded_topk_sql(q: str, k: int = 10, round_to: int = 6,
                     title_tokens: int = 4, conjunctive: bool = True,
                     min_match: int = 1) -> str:
    """Two-field (title/body) BM25 oracle — full reference semantics:
    title = first N whitespace tokens of text (the test harness's
    title derivation), record:"basic" tf=1, field boosts 1.5/1.0,
    per-field df/N/avgdl, conjunction across fields.
    ``conjunctive=False`` relaxes to should-clause scoring with
    ``min_match`` distinct matched clauses (twin of
    FieldedSearchEngine.topk_or / the fielded disjunctive WAND)."""
    qcte, n_clauses = _query_clause_cte_fielded(q)
    if conjunctive:
        having = f"    HAVING count(DISTINCT clause_id) = {n_clauses}\n"
    elif min_match > 1:
        having = f"    HAVING count(DISTINCT clause_id) >= {min_match}\n"
    else:
        having = ""
    score = _qualify(SCORE_EXPR)
    per_field = []
    for field, fb, tf_expr in [
        ("title", 1.5, "1"),            # record:"basic" -> tf==1
        ("body", 1.0, "p.tf"),
    ]:
        s = score.replace("p.tf", tf_expr) if tf_expr != "p.tf" else score
        per_field.append(
            f"SELECT q.clause_id, p.doc_id, {fb!r} * ({s}) AS s\n"
            f"    FROM qterms q\n"
            f"    JOIN postings_{field} p ON p.term = q.term\n"
            f"    JOIN df_{field} t ON t.term = q.term\n"
            f"    CROSS JOIN stats_{field} stats"
        )
    scored_union = "\n    UNION ALL\n    ".join(per_field)
    return f"""
WITH docs2 AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, {title_tokens}), ' ') AS title,
           text AS body
    FROM documents
),
toks_title AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(title), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
toks_body AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(body), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
tf_title AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_title GROUP BY 1, 2
),
tf_body AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_body GROUP BY 1, 2
),
postings_title AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_title
),
postings_body AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_body
),
df_title AS (SELECT term, count(*)::BIGINT AS df FROM tf_title GROUP BY term),
df_body AS (SELECT term, count(*)::BIGINT AS df FROM tf_body GROUP BY term),
stats_title AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_title) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
stats_body AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_body) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
{qcte},
scored AS (
    {scored_union}
),
docs_scored AS (
    SELECT doc_id, sum(s) AS score
    FROM scored GROUP BY doc_id
{having}),
rounded AS (
    SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
       doc_id, score
FROM rounded
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def fielded_multi_topk_sql(queries: list[str], k: int = 10,
                           round_to: int = 6,
                           title_tokens: int = 4,
                           min_match: int | None = None) -> str:
    """Batched fielded msearch oracle — twin of
    FieldedSearchEngine/FieldedBlockSearchEngine.multi_topk: one
    (query_id, clause_id, term, boost) relation against the per-field
    postings CTEs, per-(clause, field) scores summed per
    (query_id, doc_id), conjunction over DISTINCT clause ids per
    query, per-query round-before-rank."""
    parsed = [(qi, analyze_query(q)) for qi, q in enumerate(queries)]
    rows = [(qi, ci, t, b) for qi, cl in parsed
            for ci, (t, b) in enumerate(cl)]
    if not rows:
        return ("SELECT NULL::INT AS query_id, NULL::INT AS rank, "
                "NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE false")
    score = _qualify(SCORE_EXPR)
    qvals = ", ".join(
        f"({qi}, {ci}, {_sql_str(t)}, {b!r}::DOUBLE)"
        for qi, ci, t, b in rows
    )
    nvals = ", ".join(f"({qi}, {len(cl)})" for qi, cl in parsed if cl)
    mm_where = ("WHERE d.nmatch = qn.n_clauses" if min_match is None
                else (f"WHERE d.nmatch >= {min_match}"
                      if min_match > 1 else ""))
    per_field = []
    for field, fb, tf_expr in [
        ("title", 1.5, "1"),            # record:"basic" -> tf==1
        ("body", 1.0, "p.tf"),
    ]:
        s = score.replace("p.tf", tf_expr) if tf_expr != "p.tf" else score
        per_field.append(
            f"SELECT q.query_id, q.clause_id, p.doc_id, {fb!r} * ({s}) AS s\n"
            f"    FROM qterms q\n"
            f"    JOIN postings_{field} p ON p.term = q.term\n"
            f"    JOIN df_{field} t ON t.term = q.term\n"
            f"    CROSS JOIN stats_{field} stats"
        )
    scored_union = "\n    UNION ALL\n    ".join(per_field)
    return f"""
WITH docs2 AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, {title_tokens}), ' ') AS title,
           text AS body
    FROM documents
),
toks_title AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(title), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
toks_body AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(body), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
tf_title AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_title GROUP BY 1, 2
),
tf_body AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_body GROUP BY 1, 2
),
postings_title AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_title
),
postings_body AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_body
),
df_title AS (SELECT term, count(*)::BIGINT AS df FROM tf_title GROUP BY term),
df_body AS (SELECT term, count(*)::BIGINT AS df FROM tf_body GROUP BY term),
stats_title AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_title) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
stats_body AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_body) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
qterms(query_id, clause_id, term, boost) AS (SELECT * FROM (VALUES {qvals})),
qn(query_id, n_clauses) AS (SELECT * FROM (VALUES {nvals})),
scored AS (
    {scored_union}
),
docs_scored AS (
    SELECT query_id, doc_id, sum(s) AS score,
           count(DISTINCT clause_id) AS nmatch
    FROM scored GROUP BY query_id, doc_id
),
kept AS (
    SELECT d.query_id, d.doc_id, round(d.score, {round_to}) AS score
    FROM docs_scored d JOIN qn USING (query_id)
    {mm_where}
),
ranked AS (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC)::INT AS rank,
           doc_id, score
    FROM kept
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _query_clause_cte_fielded(q: str) -> tuple[str, int]:
    clauses = analyze_query(q)
    vals = ", ".join(
        f"({i}, {_sql_str(t)}, {b!r}::DOUBLE)"
        for i, (t, b) in enumerate(clauses)
    )
    return (
        f"qterms(clause_id, term, boost) AS (SELECT * FROM (VALUES {vals}))",
        len(clauses),
    )


def fielded_mixed_topk_sql(q: str, k: int = 10, round_to: int = 6,
                           title_tokens: int = 4) -> str:
    """Oracle for the FIELDED lenient mixed grammar
    (FieldedBlockSearchEngine.mixed_topk): term clauses score per field
    with boosts title 1.5 (record:basic tf=1) / body 1.0 and the
    lenient parse's clause boosts (a quoted token folds to 1.0);
    phrase clauses score in BODY only (title stores no positions),
    tf = phrase frequency, df = phrase doc count in body, body
    dl/avgdl; conjunction over DISTINCT clause ids."""
    from prosearch_spark.analyzer import parse_query_lenient

    clauses = parse_query_lenient(q)
    assert clauses, "fielded mixed oracle needs at least one clause"
    n_clauses = len(clauses)
    term_clauses = [(i, c) for i, (kind, c) in enumerate(clauses)
                    if kind == "term"]
    phrase_clauses = [(i, c) for i, (kind, c) in enumerate(clauses)
                      if kind == "phrase"]
    score = _qualify(SCORE_EXPR)

    ctes = [f"""docs2 AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, {title_tokens}), ' ') AS title,
           text AS body
    FROM documents
),
toks_title AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(title), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
toks_body AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(body), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
tf_title AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_title GROUP BY 1, 2
),
tf_body AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_body GROUP BY 1, 2
),
postings_title AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_title
),
postings_body AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_body
),
df_title AS (SELECT term, count(*)::BIGINT AS df FROM tf_title GROUP BY term),
df_body AS (SELECT term, count(*)::BIGINT AS df FROM tf_body GROUP BY term),
stats_title AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_title) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
stats_body AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_body) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
dlen_body AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf_body GROUP BY doc_id)"""]
    selects: list[str] = []

    if term_clauses:
        vals = ", ".join(
            f"({i}, {_sql_str(t)}, {b!r}::DOUBLE)"
            for i, (t, b) in term_clauses
        )
        ctes.append(
            f"qterms(clause_id, term, boost) AS (SELECT * FROM (VALUES {vals}))"
        )
        for field, fb, tf_expr in [
            ("title", 1.5, "1"),            # record:"basic" -> tf==1
            ("body", 1.0, "p.tf"),
        ]:
            s = score.replace("p.tf", tf_expr) if tf_expr != "p.tf" else score
            selects.append(
                f"SELECT q.clause_id, p.doc_id, {fb!r} * ({s}) AS s\n"
                f"    FROM qterms q\n"
                f"    JOIN postings_{field} p ON p.term = q.term\n"
                f"    JOIN df_{field} t ON t.term = q.term\n"
                f"    CROSS JOIN stats_{field} stats"
            )

    if phrase_clauses:
        ctes.append("""d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(body), '\\s+'), t -> t <> '') AS tl
    FROM docs2
)""")
        ctes.append("""pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
)""")
    pmap = {
        "boost": "1.0", "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl", "df": "pdf.df",
        "tf": "matched.pf", "dl": "dlen.dl",
    }
    pscore = _QUALIFY_RE.sub(lambda m: pmap[m.group(1)], SCORE_EXPR)
    for ci, terms in phrase_clauses:
        joins = "\n".join(
            f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
            f" AND a{i}.term = {_sql_str(t)}"
            for i, t in enumerate(terms[1:], start=1)
        )
        inter = "a0.positions"
        for i in range(1, len(terms)):
            inter = (f"list_intersect({inter}, "
                     f"list_transform(a{i}.positions, x -> x - {i}))")
        ctes.append(
            f"m{ci} AS (\n"
            f"    SELECT a0.doc_id, len({inter})::BIGINT AS pf\n"
            f"    FROM pos a0\n{joins}\n"
            f"    WHERE a0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"matched{ci} AS (SELECT doc_id, pf FROM m{ci} WHERE pf > 0)"
        )
        ctes.append(
            f"pdf{ci} AS (SELECT count(*)::BIGINT AS df FROM matched{ci})"
        )
        # body field boost is 1.0 under the reference's fixed boosts
        selects.append(
            f"SELECT {ci} AS clause_id, matched.doc_id, 1.0 * ({pscore}) AS s\n"
            f"    FROM matched{ci} matched\n"
            "    JOIN dlen_body dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN pdf{ci} pdf CROSS JOIN stats_body stats"
        )

    scored_union = "\n    UNION ALL\n    ".join(selects)
    ctes.append(f"scored AS (\n    {scored_union}\n)")
    ctes.append(
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score FROM scored GROUP BY doc_id\n"
        f"    HAVING count(DISTINCT clause_id) = {n_clauses}\n)"
    )
    ctes.append(
        f"rounded AS (SELECT doc_id, round(score, {round_to}) AS score "
        "FROM docs_scored)"
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "       doc_id, score\n"
        f"FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def phrase_topk_sql(phrase: str, k: int = 10, round_to: int = 6) -> str:
    """Exact-phrase BM25 top-k oracle: token positions from scratch,
    n-way shifted list_intersect, tf = phrase frequency, df = phrase
    document frequency (mirrors index/positions.py)."""
    terms = [t for t, _ in analyze_query(phrase)]
    assert terms
    joins = "\n".join(
        f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
        f" AND a{i}.term = {_sql_str(t)}"
        for i, t in enumerate(terms[1:], start=1)
    )
    inter = "a0.positions"
    for i in range(1, len(terms)):
        inter = (
            f"list_intersect({inter}, "
            f"list_transform(a{i}.positions, x -> x - {i}))"
        )
    phrase_map = {
        "boost": "1.0",
        "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl",
        "df": "pdf.df",
        "tf": "matched.pf",
        "dl": "dlen.dl",
    }
    score = _QUALIFY_RE.sub(lambda mt: phrase_map[mt.group(1)], SCORE_EXPR)
    return f"""
WITH {INDEX_CTES},
dlen AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tl
    FROM documents
),
pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
),
m AS (
    SELECT a0.doc_id, len({inter})::BIGINT AS pf
    FROM pos a0
{joins}
    WHERE a0.term = {_sql_str(terms[0])}
),
matched AS (SELECT doc_id, pf FROM m WHERE pf > 0),
pdf AS (SELECT count(*)::BIGINT AS df FROM matched),
scored AS (
    SELECT matched.doc_id, {score} AS score
    FROM matched
    JOIN dlen ON dlen.doc_id = matched.doc_id
    CROSS JOIN pdf CROSS JOIN stats
),
rounded AS (SELECT doc_id, round(score, {round_to}) AS score FROM scored)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
       doc_id, score
FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def phrase_prefix_topk_sql(phrase: str, prefix: str, k: int = 10,
                           round_to: int = 6,
                           max_expansions: int = 50) -> str:
    """Phrase + last-slot-prefix oracle (MultiPhraseQuery): the fixed
    terms' position algebra as in phrase_topk_sql, with the final slot
    intersected against the per-doc UNION of the prefix expansion's
    shifted positions; the expansion comes from the derived term_stats
    with the Lucene (df DESC, term ASC, max_expansions) cap — the same
    rule index/positions.phrase_prefix_topk applies."""
    terms = [t for t, _ in analyze_query(phrase)]
    assert terms
    n = len(terms)
    joins = "\n".join(
        f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
        f" AND a{i}.term = {_sql_str(t)}"
        for i, t in enumerate(terms[1:], start=1)
    )
    inter = "a0.positions"
    for i in range(1, n):
        inter = (
            f"list_intersect({inter}, "
            f"list_transform(a{i}.positions, x -> x - {i}))"
        )
    inter = f"list_intersect({inter}, lastpos.positions)"
    phrase_map = {
        "boost": "1.0",
        "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl",
        "df": "pdf.df",
        "tf": "matched.pf",
        "dl": "dlen.dl",
    }
    score = _QUALIFY_RE.sub(lambda mt: phrase_map[mt.group(1)], SCORE_EXPR)
    like = _sql_str(prefix.replace("%", "") + "%")
    return f"""
WITH {INDEX_CTES},
dlen AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tl
    FROM documents
),
pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
),
exp AS (
    SELECT term FROM term_stats WHERE term LIKE {like}
    ORDER BY df DESC, term ASC LIMIT {max_expansions}
),
lastpos AS (
    SELECT doc_id,
           list_sort(list_distinct(flatten(list(
               list_transform(positions, x -> x - {n}))))) AS positions
    FROM pos WHERE term IN (SELECT term FROM exp)
    GROUP BY doc_id
),
m AS (
    SELECT a0.doc_id, len({inter})::BIGINT AS pf
    FROM pos a0
{joins}
    JOIN lastpos ON lastpos.doc_id = a0.doc_id
    WHERE a0.term = {_sql_str(terms[0])}
),
matched AS (SELECT doc_id, pf FROM m WHERE pf > 0),
pdf AS (SELECT count(*)::BIGINT AS df FROM matched),
scored AS (
    SELECT matched.doc_id, {score} AS score
    FROM matched
    JOIN dlen ON dlen.doc_id = matched.doc_id
    CROSS JOIN pdf CROSS JOIN stats
),
rounded AS (SELECT doc_id, round(score, {round_to}) AS score FROM scored)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
       doc_id, score
FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def top_hits_by_group_sql(q: str, group_col: str, n_per_group: int = 3,
                          round_to: int = 6) -> str:
    """top_hits sub-aggregation oracle: per-group row_number over the
    rounded scores — twin of SearchEngine.top_hits_by_group."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "rounded AS (\n"
        f"    SELECT m.doc_id, d.{group_col} AS {group_col},\n"
        f"           round(m.score, {round_to}) AS score\n"
        "    FROM docs_scored m JOIN documents d USING (doc_id)\n"
        "),\n"
        "ranked AS (\n"
        f"    SELECT {group_col},\n"
        f"           row_number() OVER (PARTITION BY {group_col}\n"
        "               ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "           doc_id, score\n"
        "    FROM rounded\n"
        ")\n"
        f"SELECT {group_col}, rank, doc_id, score FROM ranked\n"
        f"WHERE rank <= {n_per_group} ORDER BY {group_col}, rank"
    )


def collapse_topk_sql(q: str, collapse_col: str, k: int = 10,
                      round_to: int = 6) -> str:
    """Field-collapsing oracle: best hit per collapse group, then the
    global k — twin of SearchEngine.collapse_topk."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "rounded AS (\n"
        f"    SELECT m.doc_id, d.{collapse_col} AS {collapse_col},\n"
        f"           round(m.score, {round_to}) AS score\n"
        "    FROM docs_scored m JOIN documents d USING (doc_id)\n"
        "),\n"
        "best AS (\n"
        f"    SELECT {collapse_col}, doc_id, score FROM (\n"
        f"        SELECT *, row_number() OVER (PARTITION BY {collapse_col}\n"
        "            ORDER BY score DESC, doc_id ASC) AS rn\n"
        "        FROM rounded\n"
        "    ) WHERE rn = 1\n"
        "),\n"
        "ranked AS (\n"
        "    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT\n"
        f"               AS rank, {collapse_col}, doc_id, score\n"
        "    FROM best\n"
        ")\n"
        f"SELECT rank, {collapse_col}, doc_id, score FROM ranked\n"
        f"WHERE rank <= {k} ORDER BY rank"
    )


def date_histogram_sql(q: str, anchor: str = "2020-01-01",
                       mod: int = 400) -> str:
    """Date-histogram oracle: query matches bucketed per month over
    the deterministically derived Date fast field (DATE anchor +
    doc_id % mod days) — twin of the q_date_histogram entry."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte}\n"
        f"SELECT strftime(date_trunc('month', DATE '{anchor}'"
        f" + (doc_id % {mod})::INT), '%Y-%m-%d') AS month,\n"
        "       count(*)::BIGINT AS doc_count\n"
        "FROM docs_scored GROUP BY month ORDER BY month"
    )


def topk_filtered_sql(q: str, predicate: str, k: int = 10,
                      round_to: int = 6) -> str:
    """topk_sql with a fast-field predicate applied to matches BEFORE
    ranking (Tantivy fast:true collector filter; new.rs:136-231 typed
    fields). ``predicate`` is a boolean SQL expression over the
    documents view aliased ``d``. BM25 stats stay corpus-global."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "filtered AS (\n"
        "    SELECT m.doc_id, m.score FROM docs_scored m\n"
        "    JOIN documents d USING (doc_id)\n"
        f"    WHERE {predicate}\n"
        "),\n"
        "rounded AS (\n"
        f"    SELECT doc_id, round(score, {round_to}) AS score FROM filtered\n"
        ")\n"
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "       doc_id, score\n"
        f"FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def quantized_topk_sql(q: str, k: int = 10, round_to: int = 6) -> str:
    """topk_sql with 1-byte-codebook-quantized dl (B9, meta.json:13,27):
    postings score with the decoded fieldnorm, avgdl is the mean of the
    decoded norms. The codebook literals come from the SAME Python
    table the Spark engine uses (index/fieldnorm.FIELDNORM_TABLE), so
    quantization is pure integer algebra on both sides."""
    from prosearch_spark.index.fieldnorm import quantize_dl_sql

    qcte, n_clauses = _query_clause_cte(q)
    score = _qualify(SCORE_EXPR)
    return f"""
WITH toks AS (
    SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
    ) WHERE term <> ''
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf
    FROM toks GROUP BY doc_id, term
),
dlq AS (
    SELECT doc_id, {quantize_dl_sql('dl')}::BIGINT AS dl
    FROM (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id)
),
postings AS (
    SELECT t.term, t.doc_id, t.tf, d.dl FROM tf t JOIN dlq d USING (doc_id)
),
term_stats AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
stats AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT sum(dl) FROM dlq) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
{qcte},
scored AS (
    SELECT p.doc_id AS doc_id, {score} AS s
    FROM qterms q
    JOIN postings p ON p.term = q.term
    JOIN term_stats t ON t.term = q.term
    CROSS JOIN stats
),
docs_scored AS (
    SELECT doc_id, sum(s) AS score, count(*) AS nmatch
    FROM scored GROUP BY doc_id
    HAVING count(*) = {n_clauses}
),
rounded AS (
    SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
       doc_id, score
FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def mixed_topk_sql(q: str, k: int = 10, round_to: int = 6) -> str:
    """Oracle for the lenient mixed grammar (query/mixed.mixed_topk):
    bare tokens score as term clauses, quoted spans as phrase clauses
    (tf = phrase frequency, df = phrase doc frequency), all clauses
    conjunctive, clause scores summed. Shares the clause list with the
    engine via analyzer.parse_query_lenient."""
    from prosearch_spark.analyzer import parse_query_lenient

    clauses = parse_query_lenient(q)
    assert clauses, "mixed oracle needs at least one clause"
    n_clauses = len(clauses)
    term_clauses = [c for kind, c in clauses if kind == "term"]
    phrase_clauses = [c for kind, c in clauses if kind == "phrase"]

    ctes = [INDEX_CTES.strip()]
    ctes.append(
        "dlen AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id)"
    )
    selects: list[str] = []

    if term_clauses:
        vals = ", ".join(f"({_sql_str(t)}, {b!r}::DOUBLE)"
                         for t, b in term_clauses)
        ctes.append(
            f"qterms(term, boost) AS (SELECT * FROM (VALUES {vals}))"
        )
        score = _qualify(SCORE_EXPR)
        selects.append(
            f"SELECT p.doc_id AS doc_id, {score} AS s\n"
            "    FROM qterms q\n"
            "    JOIN postings p ON p.term = q.term\n"
            "    JOIN term_stats t ON t.term = q.term\n"
            "    CROSS JOIN stats"
        )

    if phrase_clauses:
        ctes.append("""d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tl
    FROM documents
)""")
        ctes.append("""pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
)""")
    for ci, terms in enumerate(phrase_clauses):
        joins = "\n".join(
            f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
            f" AND a{i}.term = {_sql_str(t)}"
            for i, t in enumerate(terms[1:], start=1)
        )
        inter = "a0.positions"
        for i in range(1, len(terms)):
            inter = (f"list_intersect({inter}, "
                     f"list_transform(a{i}.positions, x -> x - {i}))")
        ctes.append(
            f"m{ci} AS (\n"
            f"    SELECT a0.doc_id, len({inter})::BIGINT AS pf\n"
            f"    FROM pos a0\n{joins}\n"
            f"    WHERE a0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"matched{ci} AS (SELECT doc_id, pf FROM m{ci} WHERE pf > 0)"
        )
        ctes.append(
            f"pdf{ci} AS (SELECT count(*)::BIGINT AS df FROM matched{ci})"
        )
        pmap = {
            "boost": "1.0", "n_docs": "stats.n_docs",
            "avgdl": "stats.avgdl", "df": "pdf.df",
            "tf": "matched.pf", "dl": "dlen.dl",
        }
        pscore = _QUALIFY_RE.sub(lambda m: pmap[m.group(1)], SCORE_EXPR)
        selects.append(
            f"SELECT matched.doc_id AS doc_id, {pscore} AS s\n"
            f"    FROM matched{ci} matched\n"
            "    JOIN dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN pdf{ci} pdf CROSS JOIN stats"
        )

    scored_union = "\n    UNION ALL\n    ".join(selects)
    ctes.append(f"scored AS (\n    {scored_union}\n)")
    ctes.append(
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score FROM scored GROUP BY doc_id\n"
        f"    HAVING count(*) = {n_clauses}\n)"
    )
    ctes.append(
        f"rounded AS (SELECT doc_id, round(score, {round_to}) AS score "
        "FROM docs_scored)"
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "       doc_id, score\n"
        f"FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def multi_mixed_topk_sql(queries: list[str], k: int = 10,
                         round_to: int = 6) -> str:
    """Batched MIXED msearch oracle — twin of
    BlockSearchEngine.multi_mixed_topk: per-query results identical to
    the single-query mixed oracle, tagged with the list position. The
    oracle need not batch (it recomputes ground truth): each member is
    the full mixed CTE as a subquery, UNION ALL'd. A member that
    parses to zero clauses contributes no rows, same as the engine."""
    from prosearch_spark.analyzer import parse_query_lenient

    parts = []
    for qi, q in enumerate(queries):
        if not parse_query_lenient(q):
            continue
        parts.append(
            f"SELECT {qi}::INT AS query_id, rank, doc_id, score FROM (\n"
            f"{mixed_topk_sql(q, k, round_to)}\n)"
        )
    if not parts:
        return ("SELECT NULL::INT AS query_id, NULL::INT AS rank, "
                "NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE false")
    body = "\nUNION ALL\n".join(parts)
    return (
        "SELECT query_id, rank::INT AS rank, doc_id, score FROM (\n"
        f"{body}\n) ORDER BY query_id, rank"
    )


def histogram_sql(q: str, value_col: str, interval: float) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte}\n"
        f"SELECT floor(d.{value_col} / {interval!r}) * {interval!r} AS bucket,\n"
        "       count(*)::BIGINT AS doc_count\n"
        "FROM documents d JOIN docs_scored m USING (doc_id)\n"
        "GROUP BY bucket ORDER BY bucket"
    )


def search_fetch_sql(q: str, k: int = 5, round_to: int = 6) -> str:
    """Top-k + stored-field fetch (S5/J3: hits joined back to docs)."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "rounded AS (\n"
        f"    SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored\n"
        "),\n"
        "ranked AS (\n"
        "    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "           doc_id, score\n"
        "    FROM rounded\n"
        ")\n"
        "SELECT r.rank AS rank, r.doc_id AS doc_id, r.score AS score,\n"
        "       d.lang AS lang, d.source AS source\n"
        "FROM ranked r JOIN documents d USING (doc_id)\n"
        f"WHERE r.rank <= {k}"
    )


def snippet_sql(q: str, k: int = 5, round_to: int = 6,
                window: int = 20) -> str:
    """DuckDB twin of query/snippet.make_snippet_py over the top-k rows
    (serve.rs:443-453 SnippetGenerator analog): tokenize the stored
    text, slide a fixed ``window``-token frame, keep the frame with the
    most query-term hits (ties -> earliest start), wrap matched tokens
    in <b>..</b>. The no-hit case falls out naturally: every frame sums
    to 0, the earliest frame wins, and no token highlights.
    """
    from prosearch_spark.functions.text import html_escape_sql

    terms = sorted({t for t, _ in analyze_query(q)})
    inlist = ", ".join(_sql_str(t) for t in terms)
    cte, _ = _scored_docs_cte_qualified(q)
    # tokens are HTML-escaped at render (T9) — generated from the same
    # entity table the engine uses
    esc_raw = html_escape_sql("t.raw")
    return f"""
WITH {cte},
rounded AS (
    SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored
),
ranked AS (
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
           doc_id, score
    FROM rounded
),
hits AS (SELECT rank, doc_id, score FROM ranked WHERE rank <= {k}),
dtok AS (
    SELECT h.rank, h.doc_id, h.score,
           list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '') AS tl
    FROM hits h JOIN documents d USING (doc_id)
),
tok AS (
    SELECT doc_id, i, tl[i] AS raw,
           CASE WHEN lower(tl[i]) IN ({inlist}) THEN 1 ELSE 0 END AS hit
    FROM dtok, unnest(generate_series(1, len(tl))) u(i)
),
starts AS (
    SELECT doc_id, s
    FROM (
        SELECT doc_id,
               unnest(generate_series(1, greatest(len(tl) - {window} + 1, 1))) AS s
        FROM dtok
    )
),
wins AS (
    SELECT st.doc_id, st.s, coalesce(sum(t.hit), 0) AS nhit
    FROM starts st
    LEFT JOIN tok t ON t.doc_id = st.doc_id
                   AND t.i BETWEEN st.s AND st.s + {window} - 1
    GROUP BY st.doc_id, st.s
),
best AS (
    SELECT doc_id, s FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY nhit DESC, s ASC) AS rn
        FROM wins
    ) WHERE rn = 1
),
snip AS (
    SELECT b.doc_id,
           coalesce(string_agg(
               CASE WHEN t.hit = 1 THEN '<b>' || {esc_raw} || '</b>'
                    ELSE {esc_raw} END, ' ' ORDER BY t.i), '') AS snip
    FROM best b
    LEFT JOIN tok t ON t.doc_id = b.doc_id
                   AND t.i BETWEEN b.s AND b.s + {window} - 1
    GROUP BY b.doc_id
)
SELECT h.doc_id, h.rank, h.score, s.snip
FROM hits h JOIN snip s USING (doc_id)
"""


def knn_join_lsh_sql(k: int = 3, n_planes: int = 6, seed: int = 42,
                     dim: int = 64, round_to: int = 6,
                     n_tables: int = 1, probes: int = 1) -> str:
    """DuckDB twin of ops/similarity.knn_join — the LSH-BUCKETED k-NN
    join (the 100 TB near-dup path, NOT the all-pairs formulation),
    including banded multi-table candidates (a pair qualifies when ANY
    table's signatures agree).

    The hyperplanes are md5-deterministic (ops/similarity._hyperplanes),
    so the oracle recomputes bucket membership exactly: the plane
    constants are baked into the SQL as double literals (repr() is
    shortest-roundtrip, so both engines parse the identical double).
    The sign test uses the RAW dot product — sign flips would need a
    margin within float-error of 0, far rarer than a rounded-grid
    boundary crossing.

    ``probes=2`` mirrors knn_join's multi-probe: per table, the LEFT
    side also matches with its lowest-|margin| bit flipped (first
    index on ties, same as array_position-of-min). The argmin compares
    raw |margins| on both engines — identical fold order makes a
    cross-engine flip as unlikely as a sign flip.
    """
    from prosearch_spark.ops.similarity import _hyperplanes

    if probes > 2:
        raise NotImplementedError("oracle SQL emits one flipped probe "
                                  "(probes=2); Spark supports more")
    planes = _hyperplanes(dim, n_planes * n_tables, seed)

    def dot(p):
        return ("list_dot_product(v, ["
                + ", ".join(repr(c) for c in p) + "])")

    def bit(p):
        return f"CASE WHEN {dot(p)} > 0 THEN '1' ELSE '0' END"

    def inv_bit(p):
        return f"CASE WHEN {dot(p)} > 0 THEN '0' ELSE '1' END"

    def bits(sl):
        return ",\n               ".join(bit(p) for p in sl)

    def probe_sig(sl):
        # flip the FIRST index achieving the minimum |margin| (the
        # array_position-of-min tie rule)
        absd = [f"abs({dot(p)})" for p in sl]
        least = "least(" + ", ".join(absd) + ")"
        parts = []
        for i, p in enumerate(sl):
            is_flip = " AND ".join(
                [f"{absd[i]} = {least}"]
                + [f"{absd[q]} <> {least}" for q in range(i)]
            )
            parts.append(f"CASE WHEN {is_flip} THEN {inv_bit(p)}"
                         f" ELSE {bit(p)} END")
        return ",\n               ".join(parts)

    sig_cols = ",\n           ".join(
        f"concat({bits(planes[t * n_planes:(t + 1) * n_planes])}) AS sig{t}"
        for t in range(n_tables)
    )
    if probes > 1:
        sig_cols += ",\n           " + ",\n           ".join(
            f"concat({probe_sig(planes[t * n_planes:(t + 1) * n_planes])})"
            f" AS psig{t}"
            for t in range(n_tables)
        )
    match_terms = []
    for t in range(n_tables):
        match_terms.append(f"a.sig{t} = b.sig{t}")
        if probes > 1:
            match_terms.append(f"a.psig{t} = b.sig{t}")
    any_table = " OR ".join(match_terms)
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sig AS (
    SELECT vec_id, v,
           {sig_cols}
    FROM e
),
pairs AS (
    SELECT a.vec_id AS l_id, b.vec_id AS r_id,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), {round_to}) AS cosine
    FROM sig a JOIN sig b
      ON a.vec_id <> b.vec_id AND ({any_table})
)
SELECT l_id, r_id, cosine, rank FROM (
    SELECT l_id, r_id, cosine,
           row_number() OVER (PARTITION BY l_id
                              ORDER BY cosine DESC, r_id ASC)::INT AS rank
    FROM pairs
) WHERE rank <= {k}
"""


def range_agg_sql(q: str, value_col: str,
                  ranges: list[tuple[float | None, float | None]]) -> str:
    """ES range-aggregation oracle — twin of SearchEngine.range_agg:
    one conditional count per half-open [lo, hi) bucket (None =
    unbounded), long form (range_key, doc_count) ordered by key."""
    cte, _ = _scored_docs_cte_qualified(q)
    parts = []
    for lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"d.{value_col} >= {lo!r}")
        if hi is not None:
            conds.append(f"d.{value_col} < {hi!r}")
        cond = " AND ".join(conds) if conds else "TRUE"
        lo_k = "*" if lo is None else f"{lo:g}"
        hi_k = "*" if hi is None else f"{hi:g}"
        parts.append(
            f"SELECT '{lo_k}-{hi_k}' AS range_key,\n"
            f"       sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT"
            " AS doc_count\n"
            "    FROM documents d JOIN docs_scored m USING (doc_id)"
        )
    union = "\n    UNION ALL\n    ".join(parts)
    return (
        f"WITH {cte}\n"
        f"SELECT range_key, doc_count FROM (\n    {union}\n)\n"
        "ORDER BY range_key"
    )


def percentiles_agg_sql(q: str, value_col: str,
                        ps: list[float] | None = None,
                        round_to: int = 6) -> str:
    """Percentiles-aggregation oracle: DuckDB quantile_cont uses the
    same linear-interpolation definition (rank = p*(n-1)) as Spark's
    exact ``percentile``; both sides round before compare."""
    ps = ps or [0.25, 0.5, 0.75, 0.95]
    cte, _ = _scored_docs_cte_qualified(q)
    parts = [
        f"SELECT {p!r}::DOUBLE AS p,\n"
        f"       round(quantile_cont(d.{value_col}, {p!r}), {round_to})"
        " AS value\n"
        "    FROM documents d JOIN docs_scored m USING (doc_id)"
        for p in ps
    ]
    union = "\n    UNION ALL\n    ".join(parts)
    return (
        f"WITH {cte}\n"
        f"SELECT p, value FROM (\n    {union}\n) ORDER BY p"
    )


def facet_counts_sql(q: str, facet_array_sql: str) -> str:
    """FacetCollector oracle — twin of BlockSearchEngine.facet_counts:
    per facet path prefix, the count of matched docs with >= 1 facet
    under it. ``facet_array_sql`` is a DuckDB LIST expression over the
    documents view aliased ``d`` (the deterministic facet derivation,
    recomputed independently of the artifact's fast field)."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "f AS (\n"
        f"    SELECT m.doc_id, unnest({facet_array_sql}) AS facet\n"
        "    FROM docs_scored m JOIN documents d USING (doc_id)\n"
        "),\n"
        "p AS (\n"
        "    SELECT DISTINCT doc_id,\n"
        "           array_to_string((string_split(facet, '/'))[1:i], '/') AS path\n"
        "    FROM f, unnest(generate_series(1, len(string_split(facet, '/')))) t(i)\n"
        ")\n"
        "SELECT path, count(*)::BIGINT AS doc_count FROM p\n"
        "GROUP BY path ORDER BY path"
    )


def embedding_dedup_sql(k: int = 3, threshold: float = 0.45,
                        n_planes: int = 6, seed: int = 42, dim: int = 64,
                        round_to: int = 6, n_tables: int = 1,
                        probes: int = 1) -> str:
    """DuckDB twin of ops/similarity.semantic_dedup: the knn_join_lsh
    pair query (same per-left top-k truncation) filtered to
    cosine >= threshold undirected pairs, a recursive-CTE connected
    components with min-label canonicalization, and the min-id
    survivor flag (the cluster label IS the min id)."""
    inner = knn_join_lsh_sql(k=k, n_planes=n_planes, seed=seed, dim=dim,
                             round_to=round_to, n_tables=n_tables,
                             probes=probes)
    return f"""
WITH RECURSIVE base AS ({inner}),
nd AS (
    SELECT l_id AS doc_id, r_id AS doc_id2 FROM base
    WHERE cosine >= {threshold!r} AND l_id < r_id
),
edges AS (
    SELECT doc_id AS a, doc_id2 AS b FROM nd
    UNION
    SELECT doc_id2 AS a, doc_id AS b FROM nd
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
)
SELECT node AS vec_id, min(r)::BIGINT AS cluster_id,
       (node = min(r)) AS keep
FROM reach GROUP BY node
"""


def stats_agg_sql(q: str, value_col: str) -> str:
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte}\n"
        f"SELECT count(d.{value_col})::BIGINT AS count,\n"
        f"       min(d.{value_col}) AS min, max(d.{value_col}) AS max,\n"
        f"       sum(d.{value_col})::BIGINT AS sum,\n"
        f"       round(avg(d.{value_col}), 6) AS avg\n"
        "FROM documents d JOIN docs_scored m USING (doc_id)"
    )


def terms_stats_agg_sql(q: str, group_col: str, value_col: str) -> str:
    """terms + stats sub-aggregation oracle — twin of
    SearchEngine.terms_stats_agg."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte}\n"
        f"SELECT d.{group_col} AS {group_col},\n"
        f"       count(d.{value_col})::BIGINT AS count,\n"
        f"       min(d.{value_col}) AS min, max(d.{value_col}) AS max,\n"
        f"       sum(d.{value_col})::BIGINT AS sum,\n"
        f"       round(avg(d.{value_col}), 6) AS avg\n"
        "FROM documents d JOIN docs_scored m USING (doc_id)\n"
        f"GROUP BY d.{group_col} ORDER BY d.{group_col}"
    )


def topk_page2_sql(q: str, k: int = 10, round_to: int = 6) -> str:
    """search_after oracle: with the unique (score DESC, doc_id ASC)
    tie-break, the page after the k-th hit's cursor is exactly global
    ranks k+1..2k, re-numbered from 1 — twin of topk_after seeded with
    page 1's last row."""
    cte, _ = _scored_docs_cte_qualified(q)
    return (
        f"WITH {cte},\n"
        "rounded AS (\n"
        f"    SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored\n"
        "),\n"
        "ranked AS (\n"
        "    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS g,\n"
        "           doc_id, score\n"
        "    FROM rounded\n"
        ")\n"
        f"SELECT (g - {k})::INT AS rank, doc_id, score FROM ranked\n"
        f"WHERE g > {k} AND g <= {2 * k} ORDER BY rank"
    )


def knn_ivf_sql(k: int = 10, n_centroids: int = 8, n_probe: int = 2,
                round_to: int = 6) -> str:
    """DuckDB twin of ops/similarity.ivf_sampled_topk over the
    embeddings table: query = vec 0, index = every other vector,
    coarse centroids = the n_centroids smallest non-query ids
    (sampled-member quantizer — fully derivable from the raw table, so
    the oracle needs NO data-dependent literals). Assignment, probe
    choice, and the cosine re-rank all round to ``round_to`` before
    ordering, ties to the lowest centroid index / vec_id — the same
    convention both engines share everywhere else."""
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id <> 0
),
q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
    WHERE vec_id = 0
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT e.vec_id, e.v, c.cidx,
           {l2.format(a='e.v', b='c.cv', r=round_to)} AS d
    FROM e CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT cidx FROM (
        SELECT c.cidx, {l2.format(a='q.qv', b='c.cv', r=round_to)} AS d
        FROM cent c CROSS JOIN q
    ) ORDER BY d ASC, cidx ASC LIMIT {n_probe}
),
scored AS (
    SELECT b.vec_id,
           round(list_dot_product(b.v, q.qv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(q.qv, q.qv))),
                 {round_to}) AS cosine
    FROM bucketed b JOIN probe p ON b.bucket = p.cidx
    CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::INT AS rank,
       vec_id, cosine
FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def multi_knn_ivf_sql(n_queries: int = 4, k: int = 10,
                      n_centroids: int = 8, n_probe: int = 2,
                      round_to: int = 6) -> str:
    """VectorArtifact.multi_topk twin: query vectors are
    embeddings[vec_id < n_queries] (query_id = vec_id — no data
    literals), the store is the rest; the knn_ivf quantizer/probe
    ladder runs PER QUERY (probe rank partitioned by query_id) and
    each candidate row scores only against the queries that probed
    its bucket — exactly the batched equi-join the Spark side runs."""
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id >= {n_queries}
),
qs AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < {n_queries}
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT e.vec_id, e.v, c.cidx,
           {l2.format(a='e.v', b='c.cv', r=round_to)} AS d
    FROM e CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT query_id, cidx FROM (
        SELECT qs.query_id, c.cidx,
               row_number() OVER (
                   PARTITION BY qs.query_id
                   ORDER BY {l2.format(a='qs.qv', b='c.cv', r=round_to)}
                            ASC, c.cidx ASC) AS rn
        FROM cent c CROSS JOIN qs
    ) WHERE rn <= {n_probe}
),
scored AS (
    SELECT p.query_id, b.vec_id,
           round(list_dot_product(b.v, qs.qv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(qs.qv, qs.qv))),
                 {round_to}) AS cosine
    FROM bucketed b
    JOIN probe p ON b.bucket = p.cidx
    JOIN qs ON qs.query_id = p.query_id
)
SELECT query_id, rank, vec_id, cosine FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC)::INT AS rank,
           vec_id, cosine
    FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def knn_sq_ivf_sql(k: int = 10, n_centroids: int = 8, n_probe: int = 2,
                   candidates: int = 40, round_to: int = 6) -> str:
    """DuckDB twin of VectorArtifact.sq_topk (SQ-within-IVF): the
    knn_ivf_sql coarse ladder (sampled-member centroids -> rounded-l2
    assignment -> n_probe buckets) restricted to probed rows, then the
    knn_sq algebra INSIDE them — exact (gmin, gmax) bounds over the
    store, floor-quantized codes, exact-integer dot candidates
    (sq_score DESC, vec_id ASC, LIMIT candidates), exact-cosine
    re-rank. Every stage re-derived from the raw table: the committed
    store's manifest bounds/codes/buckets must not change a result."""
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    quant = ("list_transform({v}, x -> CAST(least(greatest(floor((x - gmin)"
             " * 255.0 / (gmax - gmin)), 0), 255) AS DOUBLE))")
    # codes quantize the UNIT-NORMALIZED vector (similarity.unit_col
    # twin): the integer dot must approximate cosine, not raw IP
    unit = "list_transform({v}, x -> x / sqrt(list_dot_product({v}, {v})))"
    return f"""
WITH e AS (
    SELECT vec_id, v, {unit.format(v='v')} AS nv
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 0)
),
q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv,
           {unit.format(v='CAST(embedding AS DOUBLE[])')} AS qnv
    FROM embeddings WHERE vec_id = 0
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT e.vec_id, e.v, c.cidx,
           {l2.format(a='e.v', b='c.cv', r=round_to)} AS d
    FROM e CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT cidx FROM (
        SELECT c.cidx, {l2.format(a='q.qv', b='c.cv', r=round_to)} AS d
        FROM cent c CROSS JOIN q
    ) ORDER BY d ASC, cidx ASC LIMIT {n_probe}
),
stats AS (
    SELECT min(list_min(nv)) AS gmin, max(list_max(nv)) AS gmax FROM e
),
probed AS (
    SELECT b.vec_id, b.v, e.nv FROM bucketed b
    JOIN probe p ON b.bucket = p.cidx
    JOIN e ON e.vec_id = b.vec_id
),
cand AS (
    -- ASYMMETRIC (ADC): quantized doc codes x RAW unit query;
    -- selection orders on the raw double, the reported score is
    -- rounded (ulp-proof value hash)
    SELECT pr.vec_id,
           list_dot_product({quant.format(v='pr.nv')}, q.qnv) AS sq_raw,
           pr.v
    FROM probed pr CROSS JOIN q CROSS JOIN stats
),
top AS (
    SELECT * FROM cand
    ORDER BY sq_raw DESC, vec_id ASC LIMIT {candidates}
),
resc AS (
    SELECT t.vec_id, round(t.sq_raw, {round_to}) AS sq_score,
           round(list_dot_product(t.v, q.qv)
                 / (sqrt(list_dot_product(t.v, t.v))
                    * sqrt(list_dot_product(q.qv, q.qv))),
                 {round_to}) AS cosine
    FROM top t CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::INT AS rank,
       vec_id, sq_score, cosine
FROM resc ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


_COSINE_SQL = (
    "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), {q})\n"
    "      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),\n"
    "                               CAST(e.embedding AS DOUBLE[])))\n"
    "         * sqrt(list_dot_product({q}, {q}))), {r})"
)


def hybrid_rrf_sql(q: str, k: int = 10, depth: int = 50, k0: int = 60,
                   round_to: int = 6, qvec_id: int = 0) -> str:
    """query/hybrid.py twin: BM25 conjunctive top-``depth`` fused with
    exact-cosine top-``depth`` (query vector = embeddings[qvec_id]) by
    reciprocal ranks.  The fused score is the same two-term
    left-then-right double expression the Spark side evaluates, so
    scores are bit-identical; both sides round before the final rank.
    """
    cte, _ = _scored_docs_cte_qualified(q, conjunctive=True)
    cos = _COSINE_SQL.format(q="qv.v", r=round_to)
    return f"""WITH {cte},
lex AS (
    SELECT rank, doc_id FROM (
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM (SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored)
    ) WHERE rank <= {depth}
),
qv AS (
    SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id = {qvec_id}
),
sem_scored AS (
    SELECT e.vec_id AS doc_id, {cos} AS cosine
    FROM embeddings e CROSS JOIN qv
    WHERE e.vec_id != {qvec_id}
),
sem AS (
    SELECT rank, doc_id FROM (
        SELECT row_number() OVER (ORDER BY cosine DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM sem_scored
    ) WHERE rank <= {depth}
),
fused AS (
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           round(coalesce(1.0 / ({k0} + lex.rank), 0.0)
                 + coalesce(1.0 / ({k0} + sem.rank), 0.0),
                 {round_to}) AS rrf_score,
           lex.rank AS lex_rank, sem.rank AS sem_rank
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)::INT AS rank,
       doc_id, rrf_score, lex_rank, sem_rank
FROM fused
ORDER BY rrf_score DESC, doc_id ASC LIMIT {k}"""


def hybrid_rrf_ivf_sql(q: str, k: int = 10, depth: int = 50,
                       k0: int = 60, round_to: int = 6,
                       n_centroids: int = 8, n_probe: int = 2,
                       qvec_id: int = 0) -> str:
    """query/hybrid.hybrid_topk_ivf twin: conjunctive-BM25 lexical leg
    (WAND is exact, so one oracle serves flat and WAND engines) fused
    with the IVF PROBE as the semantic leg — the same sampled-member
    quantizer / rounded-l2 assignment / probe CTEs as knn_ivf_sql, cut
    at ``depth`` inside the probed buckets only (vector CTEs prefixed
    v* to avoid colliding with the lexical index CTEs). Fusion is the
    fixed-order two-term 1/(k0+rank) double, rounded before the final
    rank — bit-identical in both engines."""
    cte, _ = _scored_docs_cte_qualified(q, conjunctive=True)
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    return f"""WITH {cte},
lex AS (
    SELECT rank, doc_id FROM (
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM (SELECT doc_id, round(score, {round_to}) AS score FROM docs_scored)
    ) WHERE rank <= {depth}
),
ve AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id <> {qvec_id}
),
vq AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
    WHERE vec_id = {qvec_id}
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM ve ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT ve.vec_id, ve.v, c.cidx,
           {l2.format(a='ve.v', b='c.cv', r=round_to)} AS d
    FROM ve CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT cidx FROM (
        SELECT c.cidx, {l2.format(a='vq.qv', b='c.cv', r=round_to)} AS d
        FROM cent c CROSS JOIN vq
    ) ORDER BY d ASC, cidx ASC LIMIT {n_probe}
),
sem_scored AS (
    SELECT b.vec_id AS doc_id,
           round(list_dot_product(b.v, vq.qv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(vq.qv, vq.qv))),
                 {round_to}) AS cosine
    FROM bucketed b JOIN probe p ON b.bucket = p.cidx
    CROSS JOIN vq
),
sem AS (
    SELECT rank, doc_id FROM (
        SELECT row_number() OVER (ORDER BY cosine DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM sem_scored
    ) WHERE rank <= {depth}
),
fused AS (
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           round(coalesce(1.0 / ({k0} + lex.rank), 0.0)
                 + coalesce(1.0 / ({k0} + sem.rank), 0.0),
                 {round_to}) AS rrf_score,
           lex.rank AS lex_rank, sem.rank AS sem_rank
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)::INT AS rank,
       doc_id, rrf_score, lex_rank, sem_rank
FROM fused
ORDER BY rrf_score DESC, doc_id ASC LIMIT {k}"""


def multi_knn_cosine_sql(n_queries: int = 4, k: int = 10,
                         round_to: int = 6) -> str:
    """ops/similarity.multi_cosine_topk twin: query vectors are
    embeddings[vec_id < n_queries] (query_id = vec_id — no data
    literals), candidates are the rest; per-query top-k by the same
    round-before-rank + (cosine DESC, vec_id ASC) rule."""
    cos = _COSINE_SQL.format(q="qs.qv", r=round_to)
    return f"""WITH qs AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
    SELECT qs.query_id, e.vec_id, {cos} AS cosine
    FROM embeddings e CROSS JOIN qs
    WHERE e.vec_id >= {n_queries}
)
SELECT query_id, rank, vec_id, cosine FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC)::INT AS rank,
           vec_id, cosine
    FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank"""


def multi_hybrid_rrf_sql(queries: list[str], n_queries_vec: int,
                         k: int = 10, depth: int = 50, k0: int = 60,
                         round_to: int = 6) -> str:
    """query/hybrid.multi_hybrid_topk twin: lexical leg =
    multi_topk-style batch (shared postings CTE, per-query conjunction,
    PARTITIONED round-before-rank) cut at ``depth``; semantic leg =
    multi_cosine_topk-style batch (query vectors = embeddings with
    vec_id < ``n_queries_vec``, query_id = vec_id, candidates the
    rest) cut at ``depth``; fusion = the same fixed-order two-term
    1/(k0+rank) double, rounded before the final per-query rank."""
    parsed = [(qi, analyze_query(q)) for qi, q in enumerate(queries)]
    rows = [(qi, t, b) for qi, cl in parsed for t, b in cl]
    score = _qualify(SCORE_EXPR)
    qvals = ", ".join(f"({qi}, {_sql_str(t)}, {b!r}::DOUBLE)"
                      for qi, t, b in rows)
    nvals = ", ".join(f"({qi}, {len(cl)})" for qi, cl in parsed if cl)
    cos = _COSINE_SQL.format(q="qs.qv", r=round_to)
    return f"""WITH {INDEX_CTES},
qterms(query_id, term, boost) AS (SELECT * FROM (VALUES {qvals})),
qn(query_id, n_clauses) AS (SELECT * FROM (VALUES {nvals})),
lex_scored AS (
    SELECT q.query_id, p.doc_id AS doc_id, {score} AS s
    FROM qterms q
    JOIN postings p ON p.term = q.term
    JOIN term_stats t ON t.term = q.term
    CROSS JOIN stats
),
lex_kept AS (
    SELECT d.query_id, d.doc_id, round(d.score, {round_to}) AS score
    FROM (SELECT query_id, doc_id, sum(s) AS score, count(*) AS nmatch
          FROM lex_scored GROUP BY query_id, doc_id) d
    JOIN qn USING (query_id)
    WHERE d.nmatch = qn.n_clauses
),
lex AS (
    SELECT query_id, rank, doc_id FROM (
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM lex_kept
    ) WHERE rank <= {depth}
),
qs AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < {n_queries_vec}
),
sem_scored AS (
    SELECT qs.query_id, e.vec_id AS doc_id, {cos} AS cosine
    FROM embeddings e CROSS JOIN qs
    WHERE e.vec_id >= {n_queries_vec}
),
sem AS (
    SELECT query_id, rank, doc_id FROM (
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM sem_scored
    ) WHERE rank <= {depth}
),
fused AS (
    SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
           coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           round(coalesce(1.0 / ({k0} + lex.rank), 0.0)
                 + coalesce(1.0 / ({k0} + sem.rank), 0.0),
                 {round_to}) AS rrf_score,
           lex.rank AS lex_rank, sem.rank AS sem_rank
    FROM lex FULL OUTER JOIN sem
      ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, lex_rank, sem_rank FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC)::INT AS rank,
           doc_id, rrf_score, lex_rank, sem_rank
    FROM fused
) WHERE rank <= {k}
ORDER BY query_id, rank"""


def multi_hybrid_rrf_ivf_sql(queries: list[str], n_queries_vec: int,
                             k: int = 10, depth: int = 50, k0: int = 60,
                             n_centroids: int = 8, n_probe: int = 2,
                             round_to: int = 6) -> str:
    """query/hybrid.multi_hybrid_topk_ivf twin: the
    multi_hybrid_rrf_sql lexical batch fused with the BATCHED
    partition-pruned IVF leg (multi_knn_ivf_sql's per-query
    quantizer/probe ladder over the store vec_id >= n_queries_vec)
    instead of the exact full-table cosine batch."""
    parsed = [(qi, analyze_query(q)) for qi, q in enumerate(queries)]
    rows = [(qi, t, b) for qi, cl in parsed for t, b in cl]
    score = _qualify(SCORE_EXPR)
    qvals = ", ".join(f"({qi}, {_sql_str(t)}, {b!r}::DOUBLE)"
                      for qi, t, b in rows)
    nvals = ", ".join(f"({qi}, {len(cl)})" for qi, cl in parsed if cl)
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    return f"""WITH {INDEX_CTES},
qterms(query_id, term, boost) AS (SELECT * FROM (VALUES {qvals})),
qn(query_id, n_clauses) AS (SELECT * FROM (VALUES {nvals})),
lex_scored AS (
    SELECT q.query_id, p.doc_id AS doc_id, {score} AS s
    FROM qterms q
    JOIN postings p ON p.term = q.term
    JOIN term_stats t ON t.term = q.term
    CROSS JOIN stats
),
lex_kept AS (
    SELECT d.query_id, d.doc_id, round(d.score, {round_to}) AS score
    FROM (SELECT query_id, doc_id, sum(s) AS score, count(*) AS nmatch
          FROM lex_scored GROUP BY query_id, doc_id) d
    JOIN qn USING (query_id)
    WHERE d.nmatch = qn.n_clauses
),
lex AS (
    SELECT query_id, rank, doc_id FROM (
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM lex_kept
    ) WHERE rank <= {depth}
),
e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    WHERE vec_id >= {n_queries_vec}
),
qs AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < {n_queries_vec}
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT e.vec_id, e.v, c.cidx,
           {l2.format(a='e.v', b='c.cv', r=round_to)} AS d
    FROM e CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT query_id, cidx FROM (
        SELECT qs.query_id, c.cidx,
               row_number() OVER (
                   PARTITION BY qs.query_id
                   ORDER BY {l2.format(a='qs.qv', b='c.cv', r=round_to)}
                            ASC, c.cidx ASC) AS rn
        FROM cent c CROSS JOIN qs
    ) WHERE rn <= {n_probe}
),
sem_scored AS (
    SELECT p.query_id, b.vec_id AS doc_id,
           round(list_dot_product(b.v, qs.qv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(qs.qv, qs.qv))),
                 {round_to}) AS cosine
    FROM bucketed b
    JOIN probe p ON b.bucket = p.cidx
    JOIN qs ON qs.query_id = p.query_id
),
sem AS (
    SELECT query_id, rank, doc_id FROM (
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, doc_id ASC)::INT AS rank,
               doc_id
        FROM sem_scored
    ) WHERE rank <= {depth}
),
fused AS (
    SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
           coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           round(coalesce(1.0 / ({k0} + lex.rank), 0.0)
                 + coalesce(1.0 / ({k0} + sem.rank), 0.0),
                 {round_to}) AS rrf_score,
           lex.rank AS lex_rank, sem.rank AS sem_rank
    FROM lex FULL OUTER JOIN sem
      ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
)
SELECT query_id, rank, doc_id, rrf_score, lex_rank, sem_rank FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC)::INT AS rank,
           doc_id, rrf_score, lex_rank, sem_rank
    FROM fused
) WHERE rank <= {k}
ORDER BY query_id, rank"""


def multi_more_like_this_sql(seed_doc_ids: list[int], k: int = 10,
                             max_terms: int = 8, min_df: int = 2,
                             round_to: int = 6) -> str:
    """Batched-MLT twin (engine.multi_more_like_this AND
    block_engine.multi_more_like_this — one oracle, two physical
    plans): per-seed term selection by MLT_TERM_EXPR (verbatim, 6dp
    grid, ties term ASC, df >= min_df) via a window PARTITIONED by the
    seed, then disjunctive uniform-boost BM25 with each seed excluded
    from its own list (doc_id <> query_id) and a per-query
    round-before-rank window."""
    mexpr = _qualify(MLT_TERM_EXPR)
    score = _qualify(SCORE_EXPR)
    seeds = ", ".join(str(int(s)) for s in seed_doc_ids)
    return f"""WITH {INDEX_CTES},
mltsel AS (
    SELECT query_id, term, 1.0::DOUBLE AS boost FROM (
        SELECT p.doc_id AS query_id, p.term AS term,
               row_number() OVER (
                   PARTITION BY p.doc_id
                   ORDER BY {mexpr} DESC, p.term ASC) AS mrank
        FROM postings p
        JOIN term_stats t ON t.term = p.term
        CROSS JOIN stats
        WHERE p.doc_id IN ({seeds}) AND t.df >= {min_df}
    ) WHERE mrank <= {max_terms}
),
scored AS (
    SELECT q.query_id, p.doc_id AS doc_id, {score} AS s
    FROM mltsel q
    JOIN postings p ON p.term = q.term
    JOIN term_stats t ON t.term = q.term
    CROSS JOIN stats
    WHERE p.doc_id <> q.query_id
),
ranked AS (
    SELECT query_id, doc_id, round(sum(s), {round_to}) AS score
    FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, score FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC)::INT AS rank,
           doc_id, score
    FROM ranked
) WHERE rank <= {k}
ORDER BY query_id, rank"""


def phrase_slop_topk_sql(phrase: str, slop: int, k: int = 10,
                         round_to: int = 6) -> str:
    """Ordered-proximity phrase oracle (Tantivy PhraseQuery::set_slop
    parity): a doc matches iff positions p1 < ... < pn exist with
    (pn - p1) - (n - 1) <= slop; tf = DISTINCT start positions
    admitting a chain; df = matching docs; scored as a synthetic
    phrase term (exactly phrase_topk_sql's scoring CTEs). The chain
    is the EXISTS form — an n-way inequality join over exploded
    positions (intermediates bounded by the window too, which any
    satisfying chain obeys, so satisfiability is unchanged); the
    Spark twin evaluates the greedy earliest chain, which succeeds
    iff a chain exists (proof in index/positions.phrase_slop_matches).
    """
    terms = [t for t, _ in analyze_query(phrase)]
    assert len(terms) >= 2 and slop >= 0
    n = len(terms)
    window = n - 1 + slop
    joins = "\n".join(
        f"    JOIN posx a{i} ON a{i}.doc_id = a0.doc_id"
        f" AND a{i}.term = {_sql_str(t)}"
        f" AND a{i}.p > a{i - 1}.p AND a{i}.p <= a0.p + {window}"
        for i, t in enumerate(terms[1:], start=1)
    )
    phrase_map = {
        "boost": "1.0",
        "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl",
        "df": "pdf.df",
        "tf": "matched.pf",
        "dl": "dlen.dl",
    }
    score = _QUALIFY_RE.sub(lambda mt: phrase_map[mt.group(1)], SCORE_EXPR)
    return f"""
WITH {INDEX_CTES},
dlen AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tl
    FROM documents
),
posx AS (
    SELECT doc_id, i - 1 AS p, tl[i] AS term
    FROM d2, unnest(generate_series(1, len(tl))) u(i)
),
m AS (
    SELECT DISTINCT a0.doc_id, a0.p
    FROM posx a0
{joins}
    WHERE a0.term = {_sql_str(terms[0])}
),
matched AS (SELECT doc_id, count(*)::BIGINT AS pf FROM m GROUP BY doc_id),
pdf AS (SELECT count(*)::BIGINT AS df FROM matched),
scored AS (
    SELECT matched.doc_id, {score} AS score
    FROM matched
    JOIN dlen ON dlen.doc_id = matched.doc_id
    CROSS JOIN pdf CROSS JOIN stats
),
rounded AS (SELECT doc_id, round(score, {round_to}) AS score FROM scored)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,
       doc_id, score
FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def mixed_slop_topk_sql(q: str, k: int = 10, round_to: int = 6) -> str:
    """Oracle for the proximity mixed grammar
    (query/mixed.mixed_slop_topk): bare tokens = term clauses, quoted
    spans = exact phrase clauses, ``"..."~N`` = ordered slop clauses
    (tf = DISTINCT chain starts via the n-way inequality join —
    phrase_slop_topk_sql's algebra), all conjunctive, clause scores
    summed. Shares the clause list with the engine via
    analyzer.parse_query_slop."""
    from prosearch_spark.analyzer import parse_query_slop

    clauses = parse_query_slop(q)
    assert clauses, "mixed-slop oracle needs at least one clause"
    n_clauses = len(clauses)
    term_clauses = [c for kind, c in clauses if kind == "term"]
    phrase_clauses = [c for kind, c in clauses if kind == "phrase"]
    slop_clauses = [c for kind, c in clauses if kind == "slop"]

    ctes = [INDEX_CTES.strip()]
    ctes.append(
        "dlen AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id)"
    )
    selects: list[str] = []

    if term_clauses:
        vals = ", ".join(f"({_sql_str(t)}, {b!r}::DOUBLE)"
                         for t, b in term_clauses)
        ctes.append(
            f"qterms(term, boost) AS (SELECT * FROM (VALUES {vals}))"
        )
        score = _qualify(SCORE_EXPR)
        selects.append(
            f"SELECT p.doc_id AS doc_id, {score} AS s\n"
            "    FROM qterms q\n"
            "    JOIN postings p ON p.term = q.term\n"
            "    JOIN term_stats t ON t.term = q.term\n"
            "    CROSS JOIN stats"
        )

    if phrase_clauses or slop_clauses:
        ctes.append("""d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tl
    FROM documents
)""")
    if phrase_clauses:
        ctes.append("""pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
)""")
    if slop_clauses:
        ctes.append("""posx AS (
    SELECT doc_id, i - 1 AS p, tl[i] AS term
    FROM d2, unnest(generate_series(1, len(tl))) u(i)
)""")

    pmap = {
        "boost": "1.0", "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl", "df": "pdf.df",
        "tf": "matched.pf", "dl": "dlen.dl",
    }
    pscore = _QUALIFY_RE.sub(lambda m: pmap[m.group(1)], SCORE_EXPR)

    for ci, terms in enumerate(phrase_clauses):
        joins = "\n".join(
            f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
            f" AND a{i}.term = {_sql_str(t)}"
            for i, t in enumerate(terms[1:], start=1)
        )
        inter = "a0.positions"
        for i in range(1, len(terms)):
            inter = (f"list_intersect({inter}, "
                     f"list_transform(a{i}.positions, x -> x - {i}))")
        ctes.append(
            f"m{ci} AS (\n"
            f"    SELECT a0.doc_id, len({inter})::BIGINT AS pf\n"
            f"    FROM pos a0\n{joins}\n"
            f"    WHERE a0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"matched{ci} AS (SELECT doc_id, pf FROM m{ci} WHERE pf > 0)"
        )
        ctes.append(
            f"pdf{ci} AS (SELECT count(*)::BIGINT AS df FROM matched{ci})"
        )
        selects.append(
            f"SELECT matched.doc_id AS doc_id, {pscore} AS s\n"
            f"    FROM matched{ci} matched\n"
            "    JOIN dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN pdf{ci} pdf CROSS JOIN stats"
        )

    for ci, (terms, slop) in enumerate(slop_clauses):
        n = len(terms)
        window = n - 1 + slop
        joins = "\n".join(
            f"    JOIN posx b{i} ON b{i}.doc_id = b0.doc_id"
            f" AND b{i}.term = {_sql_str(t)}"
            f" AND b{i}.p > b{i - 1}.p AND b{i}.p <= b0.p + {window}"
            for i, t in enumerate(terms[1:], start=1)
        )
        ctes.append(
            f"sm{ci} AS (\n"
            f"    SELECT DISTINCT b0.doc_id, b0.p\n"
            f"    FROM posx b0\n{joins}\n"
            f"    WHERE b0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"smatched{ci} AS (SELECT doc_id, count(*)::BIGINT AS pf "
            f"FROM sm{ci} GROUP BY doc_id)"
        )
        ctes.append(
            f"spdf{ci} AS (SELECT count(*)::BIGINT AS df FROM smatched{ci})"
        )
        selects.append(
            f"SELECT matched.doc_id AS doc_id, {pscore} AS s\n"
            f"    FROM smatched{ci} matched\n"
            "    JOIN dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN spdf{ci} pdf CROSS JOIN stats"
        )

    scored_union = "\n    UNION ALL\n    ".join(selects)
    ctes.append(f"scored AS (\n    {scored_union}\n)")
    ctes.append(
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score FROM scored GROUP BY doc_id\n"
        f"    HAVING count(*) = {n_clauses}\n)"
    )
    ctes.append(
        f"rounded AS (SELECT doc_id, round(score, {round_to}) AS score "
        "FROM docs_scored)"
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "       doc_id, score\n"
        f"FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def knn_pq_ivf_sql(k: int = 10, n_centroids: int = 8, n_probe: int = 2,
                   pq_m: int = 8, pq_k: int = 16, dim: int = 64,
                   candidates: int = 40, round_to: int = 6) -> str:
    """DuckDB twin of VectorArtifact.pq_topk (PQ-within-IVF): the
    knn_ivf_sql coarse ladder (sampled-member centroids -> rounded-l2
    assignment -> n_probe buckets), then product quantization INSIDE
    the probed rows — per-subspace codebooks = unit subvectors of the
    pq_k smallest ids, per-vector codes = argmin of rounded subspace
    l2 (ties to the lowest codeword), ADC lookup values =
    list_dot_product of the unit query's subvector with each
    codeword, candidate score = the LEFT-TO-RIGHT sum of the m
    looked-up values (an m-way lut join, never a float GROUP BY — SQL
    aggregation order is not fixed, the add chain is), then the exact
    cosine re-rank. Every stage re-derived from the raw table."""
    assert dim % pq_m == 0
    dsub = dim // pq_m
    l2 = ("round(list_dot_product({a}, {a})"
          " - 2.0 * list_dot_product({a}, {b})"
          " + list_dot_product({b}, {b}), {r})")
    unit = "list_transform({v}, x -> x / sqrt(list_dot_product({v}, {v})))"
    esub = (f"list_slice(e.nv, (cw.j - 1) * {dsub} + 1, cw.j * {dsub})")
    code_cols = ", ".join(
        f"max(CASE WHEN j = {j} THEN c END) AS c{j}"
        for j in range(1, pq_m + 1))
    lut_joins = "\n".join(
        f"    JOIN lut l{j} ON l{j}.j = {j} AND l{j}.c = cp.c{j}"
        for j in range(1, pq_m + 1))
    adc = " + ".join(f"l{j}.val" for j in range(1, pq_m + 1))
    return f"""
WITH e AS (
    SELECT vec_id, v, {unit.format(v='v')} AS nv
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 0)
),
q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv,
           {unit.format(v='CAST(embedding AS DOUBLE[])')} AS qnv
    FROM embeddings WHERE vec_id = 0
),
cent AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS cidx, v AS cv
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT {n_centroids})
),
assigned AS (
    SELECT e.vec_id, e.v, c.cidx,
           {l2.format(a='e.v', b='c.cv', r=round_to)} AS d
    FROM e CROSS JOIN cent c
),
bucketed AS (
    SELECT vec_id, v, cidx AS bucket FROM (
        SELECT vec_id, v, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cidx ASC) AS rn
        FROM assigned
    ) WHERE rn = 1
),
probe AS (
    SELECT cidx FROM (
        SELECT c.cidx, {l2.format(a='q.qv', b='c.cv', r=round_to)} AS d
        FROM cent c CROSS JOIN q
    ) ORDER BY d ASC, cidx ASC LIMIT {n_probe}
),
cw AS (
    SELECT g.j::INT AS j, s.c,
           list_slice(s.nv, (g.j - 1) * {dsub} + 1, g.j * {dsub}) AS w
    FROM (
        SELECT row_number() OVER (ORDER BY vec_id ASC)::INT AS c, nv
        FROM (SELECT vec_id, nv FROM e ORDER BY vec_id ASC LIMIT {pq_k})
    ) s
    CROSS JOIN unnest(generate_series(1, {pq_m})) g(j)
),
codes AS (
    SELECT vec_id, j, c FROM (
        SELECT e.vec_id, cw.j, cw.c,
               row_number() OVER (
                   PARTITION BY e.vec_id, cw.j
                   ORDER BY {l2.format(a=esub, b='cw.w', r=round_to)} ASC,
                            cw.c ASC) AS rn
        FROM e CROSS JOIN cw
    ) WHERE rn = 1
),
cpiv AS (
    SELECT vec_id, {code_cols}
    FROM codes GROUP BY vec_id
),
lut AS (
    SELECT cw.j, cw.c,
           list_dot_product(
               list_slice(q.qnv, (cw.j - 1) * {dsub} + 1,
                          cw.j * {dsub}), cw.w) AS val
    FROM cw CROSS JOIN q
),
probed AS (
    SELECT b.vec_id, b.v FROM bucketed b
    JOIN probe p ON b.bucket = p.cidx
),
cand AS (
    SELECT pr.vec_id, {adc} AS pq_raw, pr.v
    FROM probed pr
    JOIN cpiv cp ON cp.vec_id = pr.vec_id
{lut_joins}
),
top AS (
    SELECT * FROM cand
    ORDER BY pq_raw DESC, vec_id ASC LIMIT {candidates}
),
resc AS (
    SELECT t.vec_id, round(t.pq_raw, {round_to}) AS pq_score,
           round(list_dot_product(t.v, q.qv)
                 / (sqrt(list_dot_product(t.v, t.v))
                    * sqrt(list_dot_product(q.qv, q.qv))),
                 {round_to}) AS cosine
    FROM top t CROSS JOIN q
)
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id ASC)::INT AS rank,
       vec_id, pq_score, cosine
FROM resc ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def fielded_mixed_slop_topk_sql(q: str, k: int = 10, round_to: int = 6,
                                title_tokens: int = 4) -> str:
    """Oracle for the FIELDED proximity mixed grammar
    (FieldedBlockSearchEngine.mixed_topk parsing parse_query_slop):
    fielded_mixed_topk_sql's algebra with ``"..."~N`` clauses scoring
    BODY-ONLY via the n-way inequality-join chain (the
    phrase_slop_topk_sql EXISTS form; tf = DISTINCT chain starts),
    conjunction over DISTINCT clause ids."""
    from prosearch_spark.analyzer import parse_query_slop

    clauses = parse_query_slop(q)
    assert clauses, "fielded mixed-slop oracle needs at least one clause"
    n_clauses = len(clauses)
    term_clauses = [(i, c) for i, (kind, c) in enumerate(clauses)
                    if kind == "term"]
    phrase_clauses = [(i, c) for i, (kind, c) in enumerate(clauses)
                      if kind == "phrase"]
    slop_clauses = [(i, c) for i, (kind, c) in enumerate(clauses)
                    if kind == "slop"]
    score = _qualify(SCORE_EXPR)

    ctes = [f"""docs2 AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, {title_tokens}), ' ') AS title,
           text AS body
    FROM documents
),
toks_title AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(title), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
toks_body AS (
    SELECT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(body), '\\s+')) AS term
        FROM docs2
    ) WHERE term <> ''
),
tf_title AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_title GROUP BY 1, 2
),
tf_body AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks_body GROUP BY 1, 2
),
postings_title AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_title
),
postings_body AS (
    SELECT term, doc_id, tf,
           sum(tf) OVER (PARTITION BY doc_id)::BIGINT AS dl
    FROM tf_body
),
df_title AS (SELECT term, count(*)::BIGINT AS df FROM tf_title GROUP BY term),
df_body AS (SELECT term, count(*)::BIGINT AS df FROM tf_body GROUP BY term),
stats_title AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_title) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
stats_body AS (
    SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
           (SELECT count(*) FROM toks_body) * 1.0
               / (SELECT count(*) FROM documents) AS avgdl
),
dlen_body AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf_body GROUP BY doc_id)"""]
    selects: list[str] = []

    if term_clauses:
        vals = ", ".join(
            f"({i}, {_sql_str(t)}, {b!r}::DOUBLE)"
            for i, (t, b) in term_clauses
        )
        ctes.append(
            f"qterms(clause_id, term, boost) AS (SELECT * FROM (VALUES {vals}))"
        )
        for field, fb, tf_expr in [
            ("title", 1.5, "1"),            # record:"basic" -> tf==1
            ("body", 1.0, "p.tf"),
        ]:
            s = score.replace("p.tf", tf_expr) if tf_expr != "p.tf" else score
            selects.append(
                f"SELECT q.clause_id, p.doc_id, {fb!r} * ({s}) AS s\n"
                f"    FROM qterms q\n"
                f"    JOIN postings_{field} p ON p.term = q.term\n"
                f"    JOIN df_{field} t ON t.term = q.term\n"
                f"    CROSS JOIN stats_{field} stats"
            )

    if phrase_clauses or slop_clauses:
        ctes.append("""d2 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(body), '\\s+'), t -> t <> '') AS tl
    FROM docs2
)""")
    if phrase_clauses:
        ctes.append("""pos AS (
    SELECT doc_id, term, list(i - 1 ORDER BY i) AS positions
    FROM (
        SELECT doc_id, i, tl[i] AS term
        FROM d2, unnest(generate_series(1, len(tl))) u(i)
    )
    WHERE term <> '' GROUP BY doc_id, term
)""")
    if slop_clauses:
        ctes.append("""posx AS (
    SELECT doc_id, i - 1 AS p, tl[i] AS term
    FROM d2, unnest(generate_series(1, len(tl))) u(i)
)""")
    pmap = {
        "boost": "1.0", "n_docs": "stats.n_docs",
        "avgdl": "stats.avgdl", "df": "pdf.df",
        "tf": "matched.pf", "dl": "dlen.dl",
    }
    pscore = _QUALIFY_RE.sub(lambda m: pmap[m.group(1)], SCORE_EXPR)
    for ci, terms in phrase_clauses:
        joins = "\n".join(
            f"    JOIN pos a{i} ON a{i}.doc_id = a0.doc_id"
            f" AND a{i}.term = {_sql_str(t)}"
            for i, t in enumerate(terms[1:], start=1)
        )
        inter = "a0.positions"
        for i in range(1, len(terms)):
            inter = (f"list_intersect({inter}, "
                     f"list_transform(a{i}.positions, x -> x - {i}))")
        ctes.append(
            f"m{ci} AS (\n"
            f"    SELECT a0.doc_id, len({inter})::BIGINT AS pf\n"
            f"    FROM pos a0\n{joins}\n"
            f"    WHERE a0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"matched{ci} AS (SELECT doc_id, pf FROM m{ci} WHERE pf > 0)"
        )
        ctes.append(
            f"pdf{ci} AS (SELECT count(*)::BIGINT AS df FROM matched{ci})"
        )
        selects.append(
            f"SELECT {ci} AS clause_id, matched.doc_id, 1.0 * ({pscore}) AS s\n"
            f"    FROM matched{ci} matched\n"
            "    JOIN dlen_body dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN pdf{ci} pdf CROSS JOIN stats_body stats"
        )
    for ci, (terms, slop) in slop_clauses:
        n = len(terms)
        window = n - 1 + slop
        joins = "\n".join(
            f"    JOIN posx b{i} ON b{i}.doc_id = b0.doc_id"
            f" AND b{i}.term = {_sql_str(t)}"
            f" AND b{i}.p > b{i - 1}.p AND b{i}.p <= b0.p + {window}"
            for i, t in enumerate(terms[1:], start=1)
        )
        ctes.append(
            f"sm{ci} AS (\n"
            f"    SELECT DISTINCT b0.doc_id, b0.p\n"
            f"    FROM posx b0\n{joins}\n"
            f"    WHERE b0.term = {_sql_str(terms[0])}\n)"
        )
        ctes.append(
            f"smatched{ci} AS (SELECT doc_id, count(*)::BIGINT AS pf "
            f"FROM sm{ci} GROUP BY doc_id)"
        )
        ctes.append(
            f"spdf{ci} AS (SELECT count(*)::BIGINT AS df FROM smatched{ci})"
        )
        selects.append(
            f"SELECT {ci} AS clause_id, matched.doc_id, 1.0 * ({pscore}) AS s\n"
            f"    FROM smatched{ci} matched\n"
            "    JOIN dlen_body dlen ON dlen.doc_id = matched.doc_id\n"
            f"    CROSS JOIN spdf{ci} pdf CROSS JOIN stats_body stats"
        )

    scored_union = "\n    UNION ALL\n    ".join(selects)
    ctes.append(f"scored AS (\n    {scored_union}\n)")
    ctes.append(
        "docs_scored AS (\n"
        "    SELECT doc_id, sum(s) AS score FROM scored GROUP BY doc_id\n"
        f"    HAVING count(DISTINCT clause_id) = {n_clauses}\n)"
    )
    ctes.append(
        f"rounded AS (SELECT doc_id, round(score, {round_to}) AS score "
        "FROM docs_scored)"
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank,\n"
        "       doc_id, score\n"
        f"FROM rounded ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def fielded_multi_mixed_topk_sql(queries: list[str], k: int = 10,
                                 round_to: int = 6) -> str:
    """Batched FIELDED mixed msearch oracle — twin of
    FieldedBlockSearchEngine.multi_mixed_topk: per-query results
    identical to the single-query fielded mixed oracle (terms title
    1.5 / body 1.0; phrases AND "..."~N slop clauses body-only),
    tagged with the list position. The oracle need not batch (it
    recomputes ground truth): each member is the full fielded
    mixed-slop CTE as a subquery, UNION ALL'd; a member that parses
    to zero clauses contributes no rows, same as the engine."""
    from prosearch_spark.analyzer import parse_query_slop

    parts = []
    for qi, q in enumerate(queries):
        if not parse_query_slop(q):
            continue
        parts.append(
            f"SELECT {qi}::INT AS query_id, rank, doc_id, score FROM (\n"
            f"{fielded_mixed_slop_topk_sql(q, k, round_to)}\n)"
        )
    if not parts:
        return ("SELECT NULL::INT AS query_id, NULL::INT AS rank, "
                "NULL::BIGINT AS doc_id, NULL::DOUBLE AS score WHERE false")
    body = "\nUNION ALL\n".join(parts)
    return (
        "SELECT query_id, rank::INT AS rank, doc_id, score FROM (\n"
        f"{body}\n) ORDER BY query_id, rank"
    )
