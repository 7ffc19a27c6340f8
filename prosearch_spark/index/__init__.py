from prosearch_spark.index.build import (  # noqa: F401
    InvertedIndex,
    build_index,
    doc_stats,
)
