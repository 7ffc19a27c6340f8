"""Corpus: the input_hint-shaped source-code table.

``BASELINE.json:input_hint`` mandates an Iceberg-shaped table
``(repo string, path string, commit string, lang string, content
string)`` with a per-row ``content_sha256`` invariant. Two providers:

- :func:`synth_corpus` — a fully distributed, deterministic generator
  (pure column expressions over ``spark.range``; no driver-side data, no
  RNG state — every value is a hash of the row id + seed), usable at any
  scale. The analog of the reference's fixed ingest corpus.
- :func:`corpus_from_documents` — adapts the driver-provided
  ``documents`` parquet (doc_id, text, lang, source, n_chars) into the
  same shape, so all engine paths run on driver data too.

``doc_id`` is DETERMINISTIC: dense rank over (repo, path) — required
for the reproducible score tie-break (SURVEY.md §4.3); never
``monotonically_increasing_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["python", "java", "rust", "js", "go", "md"]

# deterministic vocabulary for synthetic file content: identifiers in
# camelCase/snake_case, keywords, a pathlike import, plus the hot
# stopword-ish tokens 'return'/'the' in most docs (skew exercise).
_VOCAB = [
    "return", "the", "parseQueryString", "snake_case_value", "HttpClient",
    "spark", "shuffle", "partition", "index", "bm25", "tokenizer",
    "src/main/core", "read_parquet", "writeBatch", "merge", "commit",
    "fn", "def", "public", "let", "posting", "docId", "term_freq",
    "python", "rust", "npm",
    "avgdl", "broadcast", "skew", "salt", "block", "varint", "delta",
]


def synth_corpus(spark: SparkSession, n_docs: int = 1000,
                 n_repos: int = 12, seed: int = 42,
                 dense_ids: bool = True) -> DataFrame:
    """Deterministic distributed corpus of fake source files.

    ``dense_ids=True`` assigns doc_id = dense rank over (repo, path)
    via a single-task window — exact, for tests. For scale benches use
    ``dense_ids=False``: doc_id = the range id (already unique,
    deterministic, and distributed); see index/ids.py for the
    distributed dense assigner.
    """
    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in _VOCAB) + ")"
    n_langs = len(LANGS)
    langs_sql = "array(" + ", ".join(f"'{l}'" for l in LANGS) + ")"
    df = (
        spark.range(n_docs)
        # zipf-ish repo assignment: square the uniform to skew low ids hot
        .withColumn(
            "repo_i",
            F.expr(
                f"cast(pow(pmod(xxhash64(id, {seed}), 1000) / 1000.0, 2.0)"
                f" * {n_repos} as int)"
            ),
        )
        .withColumn("repo", F.concat(F.lit("org/proj"), F.col("repo_i")))
        .withColumn(
            "lang", F.expr(f"{langs_sql}[pmod(xxhash64(id, {seed + 1}), {n_langs})]")
        )
        .withColumn(
            "path",
            F.concat(
                F.lit("src/dir"),
                F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(7)),
                F.lit("/file_"), F.col("id"), F.lit("."),
                F.expr(
                    "CASE lang WHEN 'python' THEN 'py' WHEN 'java' THEN 'java' "
                    "WHEN 'rust' THEN 'rs' WHEN 'js' THEN 'js' WHEN 'go' THEN 'go' "
                    "ELSE 'md' END"
                ),
            ),
        )
        # content: 20-99 tokens drawn deterministically from the vocab
        .withColumn("n_tokens", F.expr(f"20 + pmod(xxhash64(id, {seed + 3}), 80)"))
        .withColumn(
            "content",
            F.expr(
                "concat_ws(' ', transform(sequence(1, n_tokens), "
                f"i -> {vocab_sql}[pmod(xxhash64(id, i, {seed + 4}), {len(_VOCAB)})]))"
            ),
        )
        .withColumn("commit", F.substring(F.sha2(F.concat("repo", F.lit("/"), "path"), 256), 1, 40))
        .withColumn("content_sha256", F.sha2("content", 256))
        .select(
            F.col("id").alias("range_id"),
            "repo", "path", "commit", "lang", "content", "content_sha256",
        )
    )
    if dense_ids:
        return with_doc_ids(df).drop("range_id")
    return df.withColumnRenamed("range_id", "doc_id")


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Deterministic dense doc_id over (repo, path).

    Scale note: a global row_number over one unpartitioned window is a
    single-task sort at 10^12 rows. The scale path is
    ``zipWithIndex``-style two-pass assignment or an Iceberg identity
    column; for rank-identity tests the dense global ordering is the
    contract, and we keep it explicit here. See index/ids.py for the
    distributed two-pass variant used by the build job.
    """
    w = Window.orderBy("repo", "path")
    return corpus.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)


def corpus_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the driver's documents table to the input_hint shape.

    Keeps the driver's ``doc_id`` (already dense + deterministic);
    ``url ≡ repo || '/' || path`` as in SURVEY.md §1.4.
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )
