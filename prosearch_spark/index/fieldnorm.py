"""1-byte fieldnorm quantization (B9; SURVEY.md §4.3, meta.json:13,27).

Tantivy stores fieldnorms as ONE BYTE per doc per field through a
256-entry codebook: token counts 0-40 are exact, larger counts take
geometric steps. The precise table lives inside the pinned tantivy
library (not this repo); we reproduce the documented SHAPE — exact
0-40, ratio 2^(1/8) per id above — and, the property rank-identity
actually needs, apply the SAME codebook symmetrically in the Spark
engine and the DuckDB oracle: ``quantize(dl)`` = the largest codebook
value <= dl (the stored norm never exceeds the true length).

Quantized mode is opt-in (``build_quantized_index``); the default
engine keeps exact dl on both sides, per the SURVEY §4.3 decision.
The 256-literal array + HOF filter costs whole-stage codegen on the
projection — documented trade, off the default hot path.
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RATIO = 2 ** 0.125  # ~9% per id above 40


def _build_table() -> list[int]:
    table = list(range(41))
    for i in range(41, 256):
        table.append(int(40 * RATIO ** (i - 40)))
    assert all(b > a for a, b in zip(table, table[1:]))  # strictly increasing
    return table


FIELDNORM_TABLE: list[int] = _build_table()


def fieldnorm_to_id(dl: int) -> int:
    """Largest id whose codebook value <= dl (dl >= 0)."""
    return bisect_right(FIELDNORM_TABLE, dl) - 1


def id_to_fieldnorm(fid: int) -> int:
    return FIELDNORM_TABLE[fid]


def quantize_dl_py(dl: int) -> int:
    """Round-trip through the codebook: the dl the engine scores with."""
    return FIELDNORM_TABLE[fieldnorm_to_id(dl)]


def quantize_dl_col(dl: Column) -> Column:
    """Spark twin of :func:`quantize_dl_py` (pure integer algebra).

    The literal array is built lazily — F.lit needs an active
    SparkContext, and the DRIVER imports this module (via
    oracle_sql generators) before any session exists."""
    table = F.array(*[F.lit(v).cast("long") for v in FIELDNORM_TABLE])
    return F.array_max(F.filter(table, lambda v: v <= dl))


def quantize_dl_sql(dl_expr: str) -> str:
    """DuckDB twin: identical table literals, identical integer compare."""
    lits = ", ".join(str(v) for v in FIELDNORM_TABLE)
    return f"list_max(list_filter([{lits}], v -> v <= {dl_expr}))"


def build_quantized_index(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          analyzer: str = "white_lower",
                          lang_col: str = "lang"):
    """build_index with codebook-quantized dl, Tantivy-style: every
    posting scores with the decoded 1-byte fieldnorm, and avgdl is the
    mean of the DECODED norms over the corpus (zero-token docs
    contribute 0, matching the exact-dl stats definition)."""
    from prosearch_spark.index.build import InvertedIndex, build_index

    idx = build_index(docs, text_col=text_col, id_col=id_col,
                      analyzer=analyzer, lang_col=lang_col)
    postings_q = idx.postings.withColumn(
        "dl", quantize_dl_col(F.col("dl"))
    )
    n_docs = docs.select(F.count("*").alias("n_docs"))
    total_q = (
        postings_q.select("doc_id", "dl").distinct()
        .select(F.sum("dl").alias("total_q"))
    )
    stats = n_docs.crossJoin(total_q).select(
        "n_docs",
        (F.coalesce(F.col("total_q"), F.lit(0)).cast("double")
         / F.col("n_docs")).alias("avgdl"),
    )
    return InvertedIndex(postings=postings_q, term_stats=idx.term_stats,
                         stats=stats)
