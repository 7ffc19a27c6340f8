"""Salted two-phase posting-list merge (hot-term skew defense).

The north_rule calls for "a salted repartition-by-term shuffle to
defeat hot-term skew". Stopword-like code tokens (``return``, ``0``,
``the``) produce posting lists with 10^8+ entries; a naive
``groupBy(term).agg(collect_list(...))`` ships every posting of a hot
term into ONE reducer (OOM + straggler). Two defenses exist in this
engine:

1. blocks.encode_blocks: ``repartitionByRange(term, doc_id)`` — a hot
   term SPANS partitions; no task ever holds a whole term. This is
   the default physical path.
2. THIS module: when a per-term ARRAY artifact is genuinely wanted
   (e.g. Tantivy-style single posting-list values, array<=bounded),
   the classic salted two-phase aggregation (reference analog: the
   round-robin + shuffled-tail fairness of Manager.java:352-384, W4):

     phase 1  groupBy(term, pmod(xxhash64(doc_id), S))  -- S-way split
              -> per-salt sorted partial arrays (bounded by 1/S of
              the term's postings, map-side combined)
     phase 2  groupBy(term) over the <=S partial rows per term
              -> flatten + array_sort -> one sorted posting array

   Phase-2 input is at most S rows per term regardless of how hot the
   term is — the skew is capped by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_posting_arrays(postings: DataFrame, n_salts: int = 16) -> DataFrame:
    """(term, doc_id, tf, dl) -> (term, df, postings array<struct>).

    ``postings`` array is sorted by doc_id; ``df`` = its length.
    """
    phase1 = (
        postings.groupBy(
            "term",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).alias("_salt"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "tf", "dl"))
            ).alias("part"),
        )
    )
    return (
        phase1.groupBy("term")
        .agg(
            F.array_sort(F.flatten(F.collect_list("part"))).alias("postings")
        )
        .select(
            "term",
            F.size("postings").cast("long").alias("df"),
            "postings",
        )
    )


def posting_array_summary(arrays: DataFrame) -> DataFrame:
    """(term, df, first_doc, last_doc) — an oracle-checkable projection
    proving completeness + sortedness of the salted merge."""
    return arrays.select(
        "term",
        "df",
        F.element_at("postings", 1)["doc_id"].alias("first_doc"),
        F.element_at("postings", -1)["doc_id"].alias("last_doc"),
    )
