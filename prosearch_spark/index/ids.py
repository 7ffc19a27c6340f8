"""Deterministic dense doc_id assignment, at scale.

Rank-identity needs deterministic doc_ids (tie-break on doc_id,
SURVEY.md §4.3), so ``monotonically_increasing_id`` is out. A global
``row_number()`` over an unpartitioned window is exact but serializes
into ONE task — fine for tests, fatal at 10^12 rows.

``assign_dense_ids`` is the distributed two-pass equivalent of
``zipWithIndex`` over a totally-ordered sort key:

  pass 1: sort by the (unique) key, count rows per partition
  pass 2: per-partition local rank + broadcast cumulative offsets

Output ids are identical to the global row_number (0-based, dense,
ordered by the key) because the sort key is unique and total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_dense_ids(df: DataFrame, order_cols: list[str],
                     id_col: str = "doc_id",
                     num_partitions: int | None = None) -> DataFrame:
    """Dense 0-based ids ordered by ``order_cols`` (must be unique).

    Uses RDD ``zipWithIndex`` — the documented exception where
    per-partition imperative logic is genuinely required: Spark SQL has
    no distributed dense-rank that avoids a single-task window. Two
    jobs (zipWithIndex counts partitions first), no shuffle beyond the
    sort.
    """
    np_ = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartitionByRange(np_, *[F.col(c) for c in order_cols]) \
                 .sortWithinPartitions(*order_cols)
    schema = StructType(arranged.schema.fields + [StructField(id_col, LongType(), False)])
    rdd = arranged.rdd.zipWithIndex().map(lambda t: (*t[0], t[1]))
    return arranged.sparkSession.createDataFrame(rdd, schema)


def assign_dense_ids_small(df: DataFrame, order_cols: list[str],
                           id_col: str = "doc_id") -> DataFrame:
    """Single-task exact variant for tests / small corpora."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return df.withColumn(id_col, F.row_number().over(w).cast("long") - 1)
