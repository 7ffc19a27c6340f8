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


def zipf_corpus(spark: SparkSession, n_docs: int = 20000,
                vocab_size: int = 2000, n_topics: int = 16,
                topic_vocab: int = 25, seed: int = 101,
                min_len: int = 40, max_len: int = 260,
                region: int = 1024) -> DataFrame:
    """Deterministic corpus with a REALISTIC long-tail vocabulary —
    the pruning benchmark the uniform synth/test corpora cannot be
    (every term there is hot in every block, so block-max bounds never
    fire; VERDICT r01).

    Two properties real crawled corpora have and WAND exploits:

    - Zipf(1) global vocabulary: filler token rank drawn by inverse
      CDF in log space (``r = floor(exp(u*ln(V)))`` => P(r) ~ 1/r).
    - doc_id-locality of topicality: contiguous ``region``-sized id
      runs share a topic (crawl order clusters by host); a topic's
      terms appear with HIGH tf inside its regions and tf~1 as
      scattered background mentions elsewhere. Block-max pruning
      skips exactly those background blocks once the seed threshold
      is set by the topical heavy hitters.

    (doc_id, content, lang): pure column expressions, no driver data.
    """
    import math

    lnv = math.log(vocab_size)
    lnt = math.log(topic_vocab)

    def u(salt: int) -> str:
        return f"(pmod(xxhash64(id, i, {salt}), 1000000) / 1000000.0)"

    # round-robin region -> topic: every topic owns >= 1 contiguous id
    # region deterministically (a hash here can leave topics empty)
    doc_topic = f"pmod(id div {region}, {n_topics})"
    zrank = f"greatest(cast(exp({u(seed + 3)} * {lnt}) as int), 1)"
    trank = f"greatest(cast(exp({u(seed + 4)} * {lnv}) as int), 1)"
    rand_topic = f"pmod(xxhash64(id, i, {seed + 5}), {n_topics})"
    token = (
        f"CASE WHEN {u(seed + 1)} < 0.35 "
        f"  THEN concat('z', {doc_topic}, '_', {zrank}) "
        f"WHEN {u(seed + 1)} < 0.45 "
        f"  THEN concat('z', {rand_topic}, '_', {zrank}) "
        f"ELSE concat('t', {trank}) END"
    )
    return (
        spark.range(n_docs)
        .withColumn(
            "n_tokens",
            F.expr(f"{min_len} + pmod(xxhash64(id, {seed + 2}), "
                   f"{max_len - min_len})"),
        )
        .withColumn(
            "content",
            F.expr(f"concat_ws(' ', transform(sequence(1, n_tokens), "
                   f"i -> {token}))"),
        )
        .select(F.col("id").alias("doc_id"), "content",
                F.lit("md").alias("lang"))
    )


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
