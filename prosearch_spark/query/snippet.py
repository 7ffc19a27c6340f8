"""Snippet generation (Q10): best fragment with term highlights.

The reference calls Tantivy's SnippetGenerator per hit
(serve.rs:443-453) and renders ``<b>`` highlights into the SERP. Our
equivalent: an Arrow-batched pandas UDF over the k result rows only
(never the full corpus — it runs AFTER top-k), choosing the
fixed-width token window with the most query-term hits and wrapping
matched tokens in ``<b>..</b>``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from prosearch_spark.analyzer import analyze_query

WINDOW_TOKENS = 20


def make_snippet_py(text: str, terms: set[str],
                    window: int = WINDOW_TOKENS) -> str:
    """Pure-Python snippet: max-hit window + <b> highlights. Document
    tokens are HTML-ESCAPED before the markup wraps them (T9,
    SearchPage.java render-time escaping — raw document text must never
    inject markup into the SERP)."""
    from prosearch_spark.functions.text import html_escape_py as esc

    if not text:
        return ""
    raw = text.split()
    low = [t.lower() for t in raw]
    hits = [1 if t in terms else 0 for t in low]
    if not any(hits):
        frag = raw[:window]
        return " ".join(esc(t) for t in frag)
    best_s, best_n = 0, -1
    run = sum(hits[:window])
    best_s, best_n = 0, run
    for s in range(1, max(1, len(raw) - window + 1)):
        run += hits[s + window - 1] if s + window - 1 < len(hits) else 0
        run -= hits[s - 1]
        if run > best_n:
            best_s, best_n = s, run
    frag = raw[best_s:best_s + window]
    out = [
        f"<b>{esc(tok)}</b>" if low[best_s + i] in terms else esc(tok)
        for i, tok in enumerate(frag)
    ]
    return " ".join(out)


def with_snippet(df: DataFrame, q: str, text_col: str,
                 out_col: str = "snip") -> DataFrame:
    terms = {t for t, _ in analyze_query(q)}

    @F.pandas_udf(StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return pd.Series([make_snippet_py(t or "", terms) for t in texts])

    return df.withColumn(out_col, snip(F.col(text_col)))
