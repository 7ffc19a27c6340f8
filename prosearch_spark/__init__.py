"""prosearch_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the query/data-processing core of
milindmantri/prosearch (reference: /root/reference) as an idiomatic
Spark engine:

- distributed posting-list construction over a source-code corpus
  (``index.build``), the Spark analog of Tantivy segment building
  (reference tantivy-cli/src/commands/index.rs:90-98),
- salted repartition-by-term merge (reference merge.rs:18-31),
- delta+varint block-max posting compression (``index.blocks``),
- BM25 (k1=1.2, b=0.75) top-k query engine with conjunction-by-default
  semantics, field/term boosts, and block-max pruning
  (reference serve.rs:336-419),
- crawl-state-shaped relational operators (per-host stats/limits/dedupe,
  reference Manager.java / JdbcStore.java),
- training-data-pipeline operators: dedup (exact/MinHash/SimHash/Jaccard),
  embedding similarity search, text quality stats (``ops``).

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, Arrow-batched pandas UDFs where Spark lacks an operator, no
row-at-a-time Python UDFs, no driver-side loops over data.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
TITLE_BOOST = 1.5
BODY_BOOST = 1.0
TERM_BOOST = 2.5
DEFAULT_K = 10
