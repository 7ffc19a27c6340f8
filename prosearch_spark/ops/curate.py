"""Training-data curation operators: benchmark decontamination, PII
redaction, Gopher-style repetition filtering, deterministic stratified
sampling, and token-budget selection.

These extend the reference's crawl-time cleaning (checksum dedupe +
content gating, CrawlerRunner.java:134-175) to the operations a
large-scale LLM training-data pipeline runs between crawling and
tokenization:

- ``decontaminate``: n-gram overlap against a (small) eval/benchmark
  set — the standard train/test contamination check. The eval shingle
  set is tiny next to the corpus, so the join is a BROADCAST hash join:
  one corpus scan at 100 TB, zero shuffle on the big side.
- ``pii_redact``: regex redaction of emails / IPv4 / phone numbers,
  with per-category counts. Pure ``regexp_replace`` column
  expressions (JVM codegen); patterns are RE2-safe so the DuckDB
  oracle runs the identical regexes.
- ``repetition_stats``: Gopher repetition rules — duplicate-{2,3}-gram
  instance fraction and top-bigram fraction per doc. Two
  ``groupBy(doc_id)`` aggregations (map-side combine), both on the
  same key.
- ``stratified_sample``: per-stratum deterministic hash sampling
  (keep iff ``sha256(id:salt)[:8] <= rate-threshold``). Reproducible
  across reruns and engines — the property pipeline snapshots need;
  no shuffle at all (pure filter).
- ``token_budget_sample``: deterministic prioritized selection under a
  per-stratum token budget — rank docs by a salted hash (reproducible
  "random" order), keep while the running BPE-token sum stays within
  budget. One partitioned window per stratum; skew is bounded by the
  largest stratum, and a global budget should be expressed as
  per-stratum budgets for exactly that reason.

All ratios are rounded to 6dp BEFORE threshold comparison / ranking so
engine-vs-oracle equality is a grid compare (CLAUDE.md float-parity
rule). Hash material is sha256 (identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prosearch_spark.analyzer import white_lower_tokens
from prosearch_spark.ops.dedup import shingles
from prosearch_spark.ops.textstats import bpe_ish_token_count

# -- PII redaction -----------------------------------------------------------

# RE2-safe (no lookaround, no backrefs — DuckDB parity): email, dotted
# IPv4, and +CC-NNN-NNN-NNNN phone shapes. Replacement order is
# email -> phone -> ip; an earlier replacement never creates a later
# pattern (the tokens contain no '@', '+', or dotted digit runs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_redact(col: Column | str) -> Column:
    """struct<clean, n_emails, n_ipv4, n_phones>: text with PII
    replaced by typed placeholders + per-category match counts
    (counted on the ORIGINAL text). One projection, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IPV4_RE, "<IP>")

    def n(pat):
        return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")

    return F.struct(
        clean.alias("clean"),
        n(EMAIL_RE).alias("n_emails"),
        n(IPV4_RE).alias("n_ipv4"),
        n(PHONE_RE).alias("n_phones"),
    )


# -- Gopher-style repetition stats -------------------------------------------

# Thresholds compared on 6dp-rounded fractions. Chosen to split the
# gate corpus non-trivially (sf0.01 dup2 p50=0.056 / p90=0.129).
REP_MAX_DUP_2GRAM = 0.09
REP_MAX_DUP_3GRAM = 0.30
REP_MAX_TOP_2GRAM = 0.05


def _gram_instance_stats(docs: DataFrame, n: int, content_col: str,
                         id_col: str) -> DataFrame:
    """(doc_id, total, dup_inst, top_n) over NON-distinct token n-gram
    instances: total gram instances, instances of grams occurring >1
    time, and the hottest gram's count."""
    toks = white_lower_tokens(content_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    inst = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
    )
    per_gram = inst.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
        .cast("long").alias("dup_inst"),
        F.max("cnt").cast("long").alias("top_n"),
    )


def repetition_stats(docs: DataFrame, content_col: str = "content",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc Gopher repetition signals + ``repetitive`` verdict:
    (doc_id, n_2grams, dup_2gram_frac, top_2gram_frac, dup_3gram_frac,
    repetitive). Fractions are instance fractions (occurrences of
    duplicated grams / all gram occurrences), rounded to 6dp before
    the threshold compare."""
    g2 = _gram_instance_stats(docs, 2, content_col, id_col)
    g3 = _gram_instance_stats(docs, 3, content_col, id_col)
    base = docs.select(F.col(id_col).alias("doc_id"))
    dup2 = F.round(F.coalesce(F.col("g2.dup_inst"), F.lit(0)) * F.lit(1.0)
                   / F.greatest(F.coalesce(F.col("g2.total"), F.lit(0)),
                                F.lit(1)), 6)
    top2 = F.round(F.coalesce(F.col("g2.top_n"), F.lit(0)) * F.lit(1.0)
                   / F.greatest(F.coalesce(F.col("g2.total"), F.lit(0)),
                                F.lit(1)), 6)
    dup3 = F.round(F.coalesce(F.col("g3.dup_inst"), F.lit(0)) * F.lit(1.0)
                   / F.greatest(F.coalesce(F.col("g3.total"), F.lit(0)),
                                F.lit(1)), 6)
    return (
        base.join(g2.alias("g2"), "doc_id", "left")
        .join(g3.alias("g3"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("g2.total"), F.lit(0)).cast("long")
            .alias("n_2grams"),
            dup2.alias("dup_2gram_frac"),
            top2.alias("top_2gram_frac"),
            dup3.alias("dup_3gram_frac"),
            # the top-gram rule fires only when the hottest gram truly
            # repeats — a short doc's top fraction is >= 1/n_grams even
            # with zero repetition, so a count-1 top gram never flags
            ((dup2 > REP_MAX_DUP_2GRAM) | (dup3 > REP_MAX_DUP_3GRAM)
             | ((F.coalesce(F.col("g2.top_n"), F.lit(0)) >= 2)
                & (top2 > REP_MAX_TOP_2GRAM))).alias("repetitive"),
        )
    )


# -- benchmark decontamination -----------------------------------------------

def decontaminate(docs: DataFrame, eval_df: DataFrame, n: int = 5,
                  content_col: str = "content", id_col: str = "doc_id",
                  eval_col: str = "text", min_hits: int = 1) -> DataFrame:
    """Flag corpus docs sharing >= ``min_hits`` distinct token
    ``n``-grams with an eval/benchmark set (the GPT-3 / Pile
    contamination-check shape).

    Returns (doc_id, n_shingles, n_overlap, contamination_ratio,
    contaminated) for EVERY corpus doc. The eval shingle set is
    deduplicated and **broadcast** — at 100 TB the corpus side is one
    scan + one groupBy(doc_id) (map-side combinable); the eval set
    (thousands of prompts) never forces a corpus shuffle.
    """
    doc_sh = shingles(docs, content_col=content_col, id_col=id_col, n=n)
    # eval ids exist only to satisfy shingles()'s id slot before the
    # order-insensitive .distinct(); still, a CONTENT hash keeps the
    # repo's determinism rule intact (index/ids.py bans
    # monotonically_increasing_id — partition-layout-dependent — so the
    # pattern must not look copyable from here either)
    ev_sh = (
        shingles(eval_df.select(F.sha2(F.col(eval_col), 256).alias("eid"),
                                F.col(eval_col)),
                 content_col=eval_col, id_col="eid", n=n)
        .select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    per = (
        doc_sh.join(F.broadcast(ev_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shingles"),
             F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
             .alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long")
            .alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).cast("long")
            .alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) * F.lit(1.0)
                    / F.greatest(F.coalesce("n_shingles", F.lit(0)),
                                 F.lit(1)), 6)
            .alias("contamination_ratio"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_hits)
            .alias("contaminated"),
        )
    )


# -- deterministic sampling --------------------------------------------------

def _hash_bucket(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of sha256('<id>:<salt>') — a uniform 32-bit
    bucket compared AS A HEX STRING so Spark and the SQL oracle share
    the exact comparison (both emit lowercase hex)."""
    return F.substring(
        F.sha2(F.concat(id_col.cast("string"), F.lit(f":{salt}")), 256),
        1, 8)


def rate_threshold_hex(rate: float) -> str:
    """Keep-iff-bucket<=threshold hex literal for a sampling rate."""
    r = min(max(float(rate), 0.0), 1.0)
    return format(int(round(r * 0xFFFFFFFF)), "08x")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "s1",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic hash sampling: (doc_id, stratum,
    bucket, keep). ``keep`` is a pure filter — reproducible across
    reruns, engines, and cluster sizes, and adding data never flips a
    prior doc's verdict (the property resumable pipeline snapshots
    need). No shuffle."""
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col("stratum") == stratum
        thr = F.lit(rate_threshold_hex(rate))
        branch = F.col("bucket") <= thr
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    keep = (expr.otherwise(F.col("bucket") <= rate_threshold_hex(default_rate))
            if expr is not None
            else F.col("bucket") <= rate_threshold_hex(default_rate))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"),
                    bucket.alias("bucket"))
        .select("doc_id", "stratum", "bucket", keep.alias("keep"))
    )


def token_budget_sample(docs: DataFrame, budget_tokens: int,
                        strata_col: str = "lang",
                        content_col: str = "content",
                        id_col: str = "doc_id",
                        salt: str = "s1") -> DataFrame:
    """Deterministic per-stratum selection under a token budget:
    (doc_id, stratum, n_tokens, cum_tokens, keep). Docs are ordered by
    a salted hash (reproducible shuffle-free "random" order, ties to
    doc_id), the BPE-ish token count accumulates per stratum, and a
    doc is kept while the running sum stays within ``budget_tokens``.

    One window partitioned by stratum — the 100 TB shape as long as
    budgets are per-stratum (a single global budget would serialize
    into one partition; split it by stratum/shard instead, exactly as
    the mixture-weights step of a training-data pipeline does)."""
    pri = _hash_bucket(F.col(id_col), salt)
    w = (Window.partitionBy("stratum")
         .orderBy(F.asc("pri"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"),
                    bpe_ish_token_count(F.col(content_col))
                    .alias("n_tokens"),
                    pri.alias("pri"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .select("doc_id", "stratum", "n_tokens", "cum_tokens",
                (F.col("cum_tokens") <= budget_tokens).alias("keep"))
    )


def mixture_budgets(budget_tokens: int,
                    weights: dict[str, float]) -> dict[str, int]:
    """Exact integer per-stratum token budgets for a target mixture:
    ``floor(weight * budget_tokens)`` per stratum. Computed ONCE in
    Python and injected as literals into both the Spark plan and the
    SQL oracle, so the (float weight x int budget) product can never
    diverge between engines."""
    return {s: int(float(w) * budget_tokens) for s, w in weights.items()}


def mixture_sample(docs: DataFrame, budget_tokens: int,
                   weights: dict[str, float],
                   strata_col: str = "lang",
                   content_col: str = "content",
                   id_col: str = "doc_id",
                   salt: str = "s1") -> DataFrame:
    """Domain-mixture selection under ONE global token budget:
    (doc_id, stratum, n_tokens, cum_tokens, stratum_budget, keep).

    The training-mixture step of an LLM data pipeline (the Pile /
    DoReMi shape): target weights say what fraction of the training
    budget each domain/language stratum should contribute; each
    stratum gets ``floor(weight * budget_tokens)`` tokens
    (:func:`mixture_budgets`) and is filled deterministically exactly
    like :func:`token_budget_sample` — salted-hash order, integer
    cumulative token sum, keep while within the stratum's budget.
    Strata with no weight get budget 0 (dropped entirely).

    This is the per-stratum-budget form that keeps the single global
    budget SCALABLE: one window per stratum (skew bounded by the
    largest stratum), integer arithmetic end-to-end, no global sort.
    Reweighting the mixture re-runs only the projection + window —
    the token counts and hash order are unchanged inputs."""
    budgets = mixture_budgets(budget_tokens, weights)
    expr = None
    for stratum, bud in sorted(budgets.items()):
        cond = F.col("stratum") == stratum
        expr = (F.when(cond, F.lit(bud)) if expr is None
                else expr.when(cond, F.lit(bud)))
    sb = (expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)) \
        .cast("long")
    pri = _hash_bucket(F.col(id_col), salt)
    w = (Window.partitionBy("stratum")
         .orderBy(F.asc("pri"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(strata_col).alias("stratum"),
                    bpe_ish_token_count(F.col(content_col))
                    .alias("n_tokens"),
                    pri.alias("pri"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("stratum_budget", sb)
        .select("doc_id", "stratum", "n_tokens", "cum_tokens",
                "stratum_budget",
                (F.col("cum_tokens") <= F.col("stratum_budget"))
                .alias("keep"))
    )


# -- chunking + sequence packing ---------------------------------------------

def chunk_documents(docs: DataFrame, chunk_tokens: int = 512,
                    stride: int | None = None,
                    content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size token windows: (doc_id,
    chunk_idx, start_token, n_tokens, chunk_text) — the
    context-window preparation step between curation and tokenization.

    Windows start every ``stride`` tokens (default ``chunk_tokens``,
    i.e. disjoint; smaller stride = overlapping windows) and hold up
    to ``chunk_tokens`` whitespace tokens. With ``chunk_tokens >=
    stride`` every token of every doc lands in the window starting at
    its floor-stride position — total, deterministic coverage
    (``chunk_tokens < stride`` is allowed and samples gaps instead);
    empty docs yield no chunks.

    Pure column expressions + one explode — no shuffle: the 100 TB
    cost is the corpus scan itself (same shape as the tokenize stage,
    build.py). The HOF lambdas here are fine off the query hot path
    (CLAUDE.md pins the restriction to hot projections)."""
    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = white_lower_tokens(content_col)
    n = F.size(toks)
    # start offsets 0, stride, 2*stride ... < n (token positions are
    # 1-based for slice)
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - 1), F.lit(0)) - F.pmod(F.greatest(n - 1, F.lit(0)),
                                               F.lit(stride)),
        F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            s.cast("long").alias("start_token"),
            F.least(F.lit(chunk_tokens), n - s).cast("long")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens))
            .alias("chunk_text"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), n.alias("n"),
                    F.explode(chunks).alias("c"))
        .filter(F.col("n") > 0)
        .select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"),
                F.col("c.start_token").alias("start_token"),
                F.col("c.n_tokens").alias("n_tokens"),
                F.col("c.chunk_text").alias("chunk_text"))
    )


def pack_sequences(chunks: DataFrame, context_tokens: int,
                   strata_col: str | None = None,
                   n_shards: int | None = None,
                   n_tokens_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   idx_col: str = "chunk_idx",
                   salt: str = "s1") -> DataFrame:
    """Streaming-concatenation packing into fixed ``context_tokens``
    sequences (the GPT-style sample-packing step): chunks are laid end
    to end in a deterministic salted-hash order (ties to (doc_id,
    chunk_idx)) and the token stream is cut every ``context_tokens``.

    Returns (doc_id, chunk_idx, stratum, n_tokens, pack_id, offset,
    spans_boundary): ``pack_id`` is the sequence the chunk STARTS in,
    ``offset`` its start position there, and ``spans_boundary`` marks
    chunks split across two sequences (real packing splits documents
    at context edges rather than padding). Integer arithmetic
    end-to-end: pack_id = (cumsum_before) div context, exactly
    reproducible across engines and cluster sizes.

    One window per stratum (pass ``strata_col``), or — for a single
    global stream — ``n_shards`` (round 6, the r5 default-ergonomics
    fix): the stream is split into N deterministic shards by the first
    hex digit of the SAME salted hash that orders it, each shard packs
    independently (window partitioned by shard — the single-partition
    trap is gone from the plan), and pack_ids renumber globally by
    per-shard offsets (one n_shards-row aggregate: shard s starts at
    sum over s' < s of ceil(shard_tokens / context)). n_shards=1 is
    bit-identical to the unsharded global stream in pack_id / offset /
    spans_boundary — NOT in the ``stratum`` column, which the sharded
    path overwrites with the shard id ("0") where the unsharded
    stream emits "all" (r6 ADVICE; consumers keying on stratum should
    treat sharded output's stratum as the shard label). Larger N
    trades a bounded amount of pack-boundary padding slack
    (< n_shards partial packs) for full parallelism."""
    if context_tokens <= 0:
        raise ValueError("context_tokens must be positive")
    if strata_col is not None and n_shards is not None:
        raise ValueError("pass strata_col or n_shards, not both")
    pri = _hash_bucket(
        F.concat(F.col(id_col).cast("string"), F.lit(":"),
                 F.col(idx_col).cast("string")), salt)
    stratum = (F.col(strata_col) if strata_col is not None
               else F.lit("all")).alias("stratum")
    base = chunks.select(
        F.col(id_col).alias("doc_id"), F.col(idx_col).alias("chunk_idx"),
        stratum, F.col(n_tokens_col).cast("long").alias("n_tokens"),
        pri.alias("pri"))
    part_col = "stratum"
    if n_shards is not None:
        if n_shards <= 0:
            raise ValueError("n_shards must be positive")
        # first hex digit of the ordering hash -> shard in [0, N);
        # locate() is the strpos() both engines share, so the oracle
        # reproduces the split with no data literals. Kept as an INT
        # column so shard offsets order numerically (a string stratum
        # would order '10' < '2').
        base = base.withColumn(
            "shard",
            F.pmod(
                F.expr("locate(substring(pri, 1, 1), '0123456789abcdef')")
                - F.lit(1),
                F.lit(n_shards)).cast("int")
        ).withColumn("stratum", F.col("shard").cast("string"))
        part_col = "shard"
    w = (Window.partitionBy(part_col)
         .orderBy(F.asc("pri"), F.asc("doc_id"), F.asc("chunk_idx"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w).cast("long")
    out = base.withColumn("cum_before", (cum - F.col("n_tokens"))
                          .cast("long"))
    local_pack = F.expr(f"cum_before div {context_tokens}")
    if n_shards is not None:
        # per-shard token totals -> global pack-id offsets: ONE
        # n_shards-row aggregate + a metadata-sized running sum,
        # broadcast back (integer arithmetic end-to-end)
        woff = (Window.orderBy(F.asc("shard"))
                .rowsBetween(Window.unboundedPreceding, -1))
        offs = (
            base.groupBy("shard")
            .agg(F.sum("n_tokens").cast("long").alias("tot"))
            .withColumn("n_packs",
                        F.expr(f"(tot + {context_tokens - 1}) "
                               f"div {context_tokens}"))
            .withColumn("pack_offset",
                        F.coalesce(F.sum("n_packs").over(woff), F.lit(0))
                        .cast("long"))
            .select("shard", "pack_offset")
        )
        out = out.join(F.broadcast(offs), "shard")
        pack_id = (F.col("pack_offset") + local_pack).cast("long")
    else:
        pack_id = local_pack.cast("long")
    return out.select(
        "doc_id", "chunk_idx", "stratum", "n_tokens",
        pack_id.alias("pack_id"),
        F.pmod(F.col("cum_before"), F.lit(context_tokens))
        .cast("long").alias("offset"),
        ((F.pmod(F.col("cum_before"), F.lit(context_tokens))
          + F.col("n_tokens")) > context_tokens)
        .alias("spans_boundary"),
    )


# -- composed curation funnel ------------------------------------------------

def curation_funnel(docs: DataFrame, eval_df: DataFrame,
                    rates: dict[str, float], strata_col: str = "lang",
                    content_col: str = "content", id_col: str = "doc_id",
                    n: int = 5, salt: str = "s1",
                    default_rate: float = 0.0) -> DataFrame:
    """The curation ladder composed end-to-end with first-failing-stage
    attribution: (doc_id, keep, drop_stage) where drop_stage names the
    FIRST stage that rejected the doc in fixed priority — 'quality'
    (Gopher hard rules), 'repetitive' (n-gram repetition),
    'contaminated' (eval overlap), 'sampled_out' (deterministic hash
    sampling) — and NULL means the doc survives the whole funnel.

    Cost shape at 100 TB: quality + sampling are pure projections (no
    shuffle); repetition and decontamination are groupBy(doc_id) aggs,
    so every join key below is the same doc_id the aggregations just
    hashed on — co-partitioned joins, no extra wide exchange beyond
    what the standalone operators already pay.
    """
    from prosearch_spark.ops.textstats import quality_filter

    qf = quality_filter(F.col(content_col))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       qf["keep"].alias("q_ok"))
    rep = repetition_stats(docs, content_col=content_col, id_col=id_col) \
        .select("doc_id", "repetitive")
    dec = decontaminate(docs, eval_df, n=n, content_col=content_col,
                        id_col=id_col).select("doc_id", "contaminated")
    smp = stratified_sample(docs, rates, strata_col=strata_col,
                            id_col=id_col, salt=salt,
                            default_rate=default_rate) \
        .select("doc_id", F.col("keep").alias("sampled"))
    stage = (
        F.when(~F.col("q_ok"), F.lit("quality"))
        .when(F.col("repetitive"), F.lit("repetitive"))
        .when(F.col("contaminated"), F.lit("contaminated"))
        .when(~F.col("sampled"), F.lit("sampled_out"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        base.join(rep, "doc_id").join(dec, "doc_id").join(smp, "doc_id")
        .select("doc_id", stage.isNull().alias("keep"),
                stage.alias("drop_stage"))
    )
