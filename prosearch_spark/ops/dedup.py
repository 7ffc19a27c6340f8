"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates crawled pages two ways: checksum-based doc
dedupe (CrawlerRunner.java:134, ``setDocumentDeduplicate(true)``) and a
unique ``(host,url)`` index whose violation rejects re-inserts
(Manager.java:44,433-436). We generalize to the standard dedup ladder:

- exact:        sha256(content) groupBy -> keep first      (P5/W6)
- near (lexical): MinHash over token shingles + LSH banding
- near (bitwise): 64-bit SimHash with Hamming-ball grouping
- near (set):     n-gram Jaccard verification on LSH candidates
- near (semantic): embedding-cosine threshold on LSH/bucket candidates

All hash material derives from md5 (available + identical in Spark,
DuckDB, and Python hashlib) so every stage is oracle-mirrorable and
deterministic. No per-row Python: everything is built-in expressions.

Scale notes: exact dedup is one hash-shuffle on a 64-hex key. MinHash
signatures are computed map-side (explode -> groupBy(doc) partial min);
LSH banding turns all-pairs O(n^2) into per-bucket candidate pairs; the
``doc_id < doc_id2`` constraint halves pair output; verification joins
stay within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prosearch_spark.analyzer import white_lower_tokens


def exact_dedup(docs: DataFrame, content_col: str = "content",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per exact content hash (deterministic)."""
    w = Window.partitionBy("content_sha").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("content_sha", F.sha2(F.col(content_col), 256))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "content_sha")
    )


def exact_dup_groups(docs: DataFrame, content_col: str = "content",
                     id_col: str = "doc_id") -> DataFrame:
    """(content_sha256, n_dups, keeper_id) for groups with duplicates."""
    return (
        docs.groupBy(F.sha2(F.col(content_col), 256).alias("content_sha256"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# -- MinHash + LSH -----------------------------------------------------------

def _md5_long(col):
    """First 15 hex chars of md5 -> non-negative bigint (60 bits).

    conv() parses hex; 15 nibbles always fit a signed int64. md5 is
    identical across Spark / DuckDB / hashlib -> oracle-mirrorable.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(docs: DataFrame, content_col: str = "content",
             id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct token n-grams per doc."""
    toks = white_lower_tokens(content_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc_id, sig: array<long>) — min over shingles of seeded md5.

    Permutation i hashes ``md5(i || ':' || shingle)``; the min per doc is
    a standard MinHash estimator. ONE shuffle: the per-shingle hash
    array is computed map-side, then a single ``groupBy(doc_id)`` takes
    the element-wise min as ``num_hashes`` independent min aggregates
    (partial map-side combine applies to each) — no posexplode, no
    16-32x row amplification on the dedup hot path.
    """
    hashes = F.array(*[
        _md5_long(F.concat(F.lit(f"{i}:"), F.col("shingle")))
        for i in range(num_hashes)
    ])
    per_row = sh.select("doc_id", hashes.alias("h"))
    mins = per_row.groupBy("doc_id").agg(*[
        F.min(F.element_at("h", i + 1)).alias(f"m{i}")
        for i in range(num_hashes)
    ])
    return mins.select(
        "doc_id",
        F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(sig: DataFrame, bands: int = 8,
                        rows_per_band: int = 4) -> DataFrame:
    """(doc_id, doc_id2) candidate pairs sharing >=1 LSH band bucket."""
    assert "sig" in sig.columns
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ",",
                        *[F.element_at("sig", b * rows_per_band + r + 1)
                          for r in range(rows_per_band)],
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    other = banded.select(
        F.col("doc_id").alias("doc_id2"), "band", "bucket"
    )
    return (
        banded.join(other, ["band", "bucket"])
        .filter(F.col("doc_id") < F.col("doc_id2"))
        .select("doc_id", "doc_id2")
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame,
                   threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs >= threshold.

    |A ∩ B| via join on shingle within pairs; |A ∪ B| = |A|+|B|-|∩|.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("da"), F.col("shingle").alias("sha"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("shingle").alias("shb"))
    inter = (
        pairs.join(a, pairs["doc_id"] == a["da"])
        .join(b, (pairs["doc_id2"] == b["db"]) & (F.col("sha") == F.col("shb")))
        .groupBy("doc_id", "doc_id2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "d1")
                   .withColumnRenamed("sz", "sz1"),
                   F.col("doc_id") == F.col("d1"))
        .join(sizes.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("sz", "sz2"),
              F.col("doc_id2") == F.col("d2"))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "doc_id2", F.round("jaccard", 6).alias("jaccard"))
    )


def exact_jaccard_pairs(docs: DataFrame, content_col: str = "content",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over every co-shingle pair (no LSH) —
    the ground truth the LSH pipeline approximates; used as its
    recall oracle and as the gate-scale dedup entry."""
    sh = shingles(docs, content_col, id_col, n)
    a = sh.select(F.col("doc_id").alias("da"), F.col("shingle").alias("sha"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("shingle").alias("shb"))
    pairs = (
        a.join(b, (F.col("sha") == F.col("shb")) & (F.col("da") < F.col("db")))
        .select(F.col("da").alias("doc_id"), F.col("db").alias("doc_id2"))
        .distinct()
    )
    return jaccard_verify(sh, pairs, threshold)


def minhash_dedup_pairs(docs: DataFrame, content_col: str = "content",
                        id_col: str = "doc_id", n: int = 3,
                        num_hashes: int = 32, bands: int = 8,
                        threshold: float = 0.7) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH -> verify."""
    sh = shingles(docs, content_col, id_col, n)
    sig = minhash_signatures(sh, num_hashes)
    pairs = lsh_candidate_pairs(sig, bands, num_hashes // bands)
    return jaccard_verify(sh, pairs, threshold)


# -- SimHash ------------------------------------------------------------------

def simhash(docs: DataFrame, content_col: str = "content",
            id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — tf-weighted bitwise majority over token md5s.

    bit_j(doc) = 1 iff sum over distinct terms of tf * (+1 if bit_j(md5(term))
    else -1) > 0. Pure expressions; bits default 32 to bound the
    per-bit aggregate width.
    """
    toks = white_lower_tokens(content_col)
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _md5_long(F.col("term")))
    )
    bit_sums = tf.groupBy("doc_id").agg(*[
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{j}")
        for j in range(bits)
    ])
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else (sig + term)
    return bit_sums.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3,
                       bits: int = 32, blocks: int = 4) -> DataFrame:
    """Near pairs by Hamming distance <= max_hamming.

    Pigeonhole blocking: split the signature into ``blocks`` chunks; any
    pair within distance max_hamming < blocks shares >=1 exact chunk, so
    candidates come from equi-joins on chunk value (no cross join).
    """
    width = bits // blocks
    mask = (1 << width) - 1
    chunked = sim.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for i in range(blocks)
        ])).alias("bc"),
    ).select("doc_id", "simhash", "bc.blk", "bc.chunk")
    other = chunked.select(
        F.col("doc_id").alias("doc_id2"), F.col("simhash").alias("simhash2"),
        "blk", "chunk",
    )
    cand = (
        chunked.join(other, ["blk", "chunk"])
        .filter(F.col("doc_id") < F.col("doc_id2"))
        .select("doc_id", "simhash", "doc_id2", "simhash2")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("simhash").bitwiseXOR(F.col("simhash2")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id", "doc_id2", "hamming")
    )


# -- near-dup cluster assignment ----------------------------------------------

def dup_clusters(pairs: DataFrame, left: str = "doc_id",
                 right: str = "doc_id2", max_iter: int = 20) -> DataFrame:
    """(node, cluster_id): connected components over a near-dup pair
    list — the step AFTER pair-finding in a real dedup pipeline (keep
    one doc per cluster, not per pair: pairwise keeps can disagree on
    transitive chains a~b~c).

    Iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbors; converges in
    O(graph diameter) rounds. Near-dup components are duplicate groups
    (tiny diameter), so 2-4 shuffle rounds in practice; ``max_iter``
    bounds adversarial chains, and the loop exits early on a converged
    round (one count per round — driver-bounded, no collect of nodes).
    At 100 TB this is the standard alternating-star CC shape: each
    round is ONE shuffle keyed by node id; labels are longs.
    """
    edges = pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(F.col("node").alias("b"),
                                  F.col("label").alias("blabel")),
                    "b",
                )
                .groupBy("a").agg(F.min("blabel").alias("nmin"))
                .select(F.col("a").alias("node"), "nmin")
            )
            new_labels = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nmin"), F.col("label")),
                    ).alias("label"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        # materialize the final labels into their cache BEFORE edges
        # unpersist: the returned frame then reads the cache instead of
        # replaying the whole iteration chain (at 100 TB you would
        # write labels to storage here — the lineage is k joins deep)
        labels.count()
        return labels.select("node", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def keep_best(clusters: DataFrame, docs: DataFrame, score_col: str,
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster_id, keep): pick ONE canonical survivor per
    near-dup cluster — the step after :func:`dup_clusters` in a real
    training-data dedup pipeline (drop the duplicates, keep the best
    exemplar). Rule: highest ``score_col`` (e.g. a quality score or
    content length), ties to the lowest doc_id — deterministic so the
    SQL oracle recomputes the same survivor.

    Plan: broadcast-sized cluster labels join the score column, then
    one PARTITIONED row_number per cluster (WindowGroupLimit shape —
    per-task partial winners, no global sort). At 100 TB clusters are
    the tiny side of the corpus; the window partitions by cluster_id,
    so skew equals the largest duplicate group (bounded by the
    near-dup threshold, not the corpus)."""
    from pyspark.sql import Window

    j = (
        clusters.select(F.col("node").alias("doc_id"), "cluster_id")
        .join(docs.select(F.col(id_col).alias("doc_id"), score_col),
              "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc("doc_id"))
    return (
        j.withColumn("keep", F.row_number().over(w) == F.lit(1))
        .select("doc_id", "cluster_id", "keep")
    )
