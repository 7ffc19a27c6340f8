"""Brute-force Python BM25 oracle for pytest rank-identity checks.

An independent, trivially-auditable implementation of the reference's
scoring semantics (SURVEY.md §4.3): no Spark, no SQL — plain dicts over
a list of documents. The Spark engine must be rank-identical to this on
the fixed query set (FIXTURES.md §2-3).

Field semantics follow the reference schema (meta.json:7-47):
- ``body``: tf counted, boost 1.0
- ``title``: record:"basic" -> tf forced to 1, boost 1.5
Per-field df, N, avgdl.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from prosearch_spark.analyzer import (
    TERM_BOOST,
    BOOST_TERMS,
    analyze_code,
    analyze_query,
    white_lower_py,
)

K1 = 1.2
B = 0.75
FIELD_BOOSTS = {"title": 1.5, "body": 1.0}
BASIC_FIELDS = frozenset({"title"})  # tf==1 fields (meta.json:12)


def _tokenize(text: str, lang: str | None, analyzer: str) -> list[str]:
    if analyzer == "white_lower":
        return white_lower_py(text)
    if analyzer == "code":
        return analyze_code(text, lang)
    raise ValueError(analyzer)


@dataclass
class OracleIndex:
    tf: dict[str, dict[tuple[str, int], int]]  # field -> (term, doc_id) -> tf
    df: dict[str, Counter]  # field -> term -> df
    dl: dict[str, dict[int, int]]  # field -> doc_id -> token count
    n_docs: int
    avgdl: dict[str, float]


def build_oracle_index(docs: list[dict], fields: dict[str, str],
                       analyzer: str = "white_lower",
                       id_col: str = "doc_id") -> OracleIndex:
    """``fields`` maps field name -> source dict key."""
    tf: dict[str, dict[tuple[str, int], int]] = {f: {} for f in fields}
    df: dict[str, Counter] = {f: Counter() for f in fields}
    dl: dict[str, dict[int, int]] = {f: {} for f in fields}
    for d in docs:
        did = d[id_col]
        for field, key in fields.items():
            toks = _tokenize(d[key], d.get("lang"), analyzer)
            dl[field][did] = len(toks)
            c = Counter(toks)
            for t, n in c.items():
                tf[field][(t, did)] = n
                df[field][t] += 1
    n = len(docs)
    avgdl = {f: (sum(dl[f].values()) / n if n else 0.0) for f in fields}
    return OracleIndex(tf=tf, df=df, dl=dl, n_docs=n, avgdl=avgdl)


def bm25_term_field(idx: OracleIndex, term: str, doc_id: int,
                    field: str) -> float | None:
    tf = idx.tf[field].get((term, doc_id))
    if tf is None:
        return None
    if field in BASIC_FIELDS:
        tf = 1
    df = idx.df[field][term]
    dl = idx.dl[field][doc_id]
    idf = math.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5))
    return (
        idf * (tf * (K1 + 1.0))
        / (tf + K1 * (1.0 - B + B * dl / idx.avgdl[field]))
    )


def topk(idx: OracleIndex, q: str, k: int = 10,
         fields: tuple[str, ...] = ("body",),
         field_boosts: dict[str, float] | None = None) -> list[tuple[int, float]]:
    """Conjunction-by-default multi-field BM25 top-k.

    A doc matches iff EVERY query clause hits at least one field
    (serve.rs:343-344); each clause's score is the boost-weighted sum of
    its per-field scores (Q3: term -> title OR body with field boosts).
    Tie-break: (score DESC, doc_id ASC).
    """
    boosts = field_boosts or {f: FIELD_BOOSTS.get(f, 1.0) for f in fields}
    clauses = analyze_query(q)
    all_docs = set()
    for f in fields:
        all_docs.update(idx.dl[f].keys())
    scored: list[tuple[int, float]] = []
    for did in all_docs:
        total = 0.0
        ok = True
        for term, boost in clauses:
            clause_score = 0.0
            hit = False
            for f in fields:
                s = bm25_term_field(idx, term, did, f)
                if s is not None:
                    hit = True
                    clause_score += boosts[f] * s
            if not hit:
                ok = False
                break
            total += boost * clause_score
        if ok and clauses:
            scored.append((did, total))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
