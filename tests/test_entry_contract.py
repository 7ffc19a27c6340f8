"""Driver-contract smoke: entry() + a queries()/oracle_sql() sample.

The full sweep lives in tools/check_oracle.py; here we gate a
representative subset at sf0.001 so `pytest -x -q` stays fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "index_postings",
    "index_corpus_stats",
    "bm25_topk_and2",
    "bm25_topk_nomatch",
    "bm25_count",
    "content_sha256",
    "per_host_limit",
    "knn_cosine",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True) if len(df) else df


def test_entry_runs(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 0
    assert {"rank", "doc_id", "score"} <= set(out.columns)


def test_queries_have_oracles_or_are_flagged():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every entry is oracle-gated since round 2 (snippets gained a SQL
    # oracle); no rows-only exceptions remain
    assert set(qs) - set(oracles) == set()


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, ducks, name):
    qs = entrymod.queries()
    got = _normalize(qs[name](spark, SF).toPandas())
    exp = _normalize(ducks.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    assert got.equals(exp)
