"""Unit tests for the training-data curation ladder (ops/curate.py)
and the SQ8 ANN path (ops/similarity.sq_topk) on handcrafted inputs
with exact expected values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prosearch_spark.ops import curate as cu
from prosearch_spark.ops import similarity as sim


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# -- pii_redact --------------------------------------------------------------

def test_pii_redact_counts_and_placeholders(spark):
    d = _docs(spark, [
        (1, "mail a@b.co and c.d+x@e.org now", "en"),
        (2, "node 10.1.57.25 and 192.168.0.1 up", "en"),
        (3, "call +1-415-555-0042 today", "en"),
        (4, "clean text only", "en"),
    ])
    r = cu.pii_redact(F.col("text"))
    out = {row["doc_id"]: row for row in d.select(
        "doc_id", r["clean"].alias("clean"), r["n_emails"].alias("ne"),
        r["n_ipv4"].alias("ni"), r["n_phones"].alias("np")).collect()}
    assert out[1]["clean"] == "mail <EMAIL> and <EMAIL> now"
    assert out[1]["ne"] == 2 and out[1]["ni"] == 0 and out[1]["np"] == 0
    assert out[2]["clean"] == "node <IP> and <IP> up"
    assert out[2]["ni"] == 2
    assert out[3]["clean"] == "call <PHONE> today"
    assert out[3]["np"] == 1
    assert out[4]["clean"] == "clean text only"
    assert (out[4]["ne"], out[4]["ni"], out[4]["np"]) == (0, 0, 0)


def test_pii_redact_idempotent_on_adversarial_text(spark):
    # Placeholders must never re-match any pattern on realistic text
    # (an earlier replacement creating a later match would make
    # repeated cleaning passes — common in multi-stage pipelines —
    # diverge). Adversarial shapes: all three categories in one doc,
    # punctuation hugging the match, partial-looking runs, and
    # already-redacted text. (A pathological "x@y.io@z.org" is NOT
    # idempotent by construction — the residue "@z.org" glued to the
    # placeholder is email-shaped again; regex redaction cannot fix
    # that and the gate's synthesized PII never produces it.)
    rows = [
        (1, "a@b.co 10.1.2.3 +1-415-555-0042 all three", "en"),
        (2, "wrap (a@b.co) and dash pre-a@b.co-post", "en"),
        (3, "five-octet 1.2.3.4.5 run and 999.1.1.1 wide octets", "en"),
        (4, "<EMAIL> already redacted plus new a@b.co", "en"),
        (5, "phone no +1-415-555-004 too short, +12-333-444-5555 ok", "en"),
        (6, "email.with.dots+tag@sub.domain.co.uk then 8.8.8.8", "en"),
    ]
    d = _docs(spark, rows)
    once = d.select("doc_id",
                    cu.pii_redact(F.col("text"))["clean"].alias("text"))
    twice = once.select("doc_id",
                        cu.pii_redact(F.col("text"))["clean"].alias("text"))
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
    # second pass also counts zero PII in the redacted text
    r2 = cu.pii_redact(F.col("text"))
    counts = once.select(
        (r2["n_emails"] + r2["n_ipv4"] + r2["n_phones"]).alias("n")).collect()
    assert all(row["n"] == 0 for row in counts)


# -- repetition_stats --------------------------------------------------------

def test_repetition_stats_exact_fractions(spark):
    # "a b a b a" -> 2-gram instances: [a b, b a, a b, b a]; all 4 are
    # duplicated (dup=1.0), top gram count 2/4 = 0.5
    # 3-grams: [a b a, b a b, a b a] -> dup 2/3
    d = _docs(spark, [
        (1, "a b a b a", "en"),
        (2, "w x y z q", "en"),   # all grams unique
    ])
    out = {r["doc_id"]: r for r in cu.repetition_stats(
        d, content_col="text").collect()}
    assert out[1]["n_2grams"] == 4
    assert out[1]["dup_2gram_frac"] == 1.0
    assert out[1]["top_2gram_frac"] == 0.5
    assert out[1]["dup_3gram_frac"] == pytest.approx(round(2 / 3, 6))
    assert out[1]["repetitive"] is True
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["repetitive"] is False


def test_repetition_stats_covers_every_doc(spark):
    d = _docs(spark, [(1, "one", "en"), (2, "two words here", "en")])
    out = cu.repetition_stats(d, content_col="text")
    assert out.count() == 2  # single-token doc still gets a row


# -- decontaminate -----------------------------------------------------------

def test_decontaminate_flags_verbatim_overlap(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "totally unrelated content with different words entirely", "en"),
    ])
    ev = spark.createDataFrame([("quick brown fox jumps over",)], "text string")
    out = {r["doc_id"]: r for r in cu.decontaminate(
        docs, ev, n=5, content_col="text").collect()}
    assert out[1]["contaminated"] is True
    assert out[1]["n_overlap"] == 1  # exactly the eval 5-gram
    assert out[2]["contaminated"] is False
    assert out[2]["n_overlap"] == 0
    # ratio = overlap / distinct shingles of the doc (9 tokens -> 5)
    assert out[1]["n_shingles"] == 5
    assert out[1]["contamination_ratio"] == pytest.approx(0.2)


# -- stratified_sample -------------------------------------------------------

def test_stratified_sample_rate_extremes_and_determinism(spark):
    rows = [(i, f"text {i}", "en" if i % 2 == 0 else "de")
            for i in range(200)]
    d = _docs(spark, rows)
    out = cu.stratified_sample(d, {"en": 1.0, "de": 0.0}, strata_col="lang")
    kept = out.groupBy("stratum").agg(
        F.sum(F.col("keep").cast("int")).alias("n")).collect()
    by = {r["stratum"]: r["n"] for r in kept}
    assert by["en"] == 100 and by["de"] == 0
    # deterministic across invocations
    a = sorted((r["doc_id"], r["keep"]) for r in
               cu.stratified_sample(d, {"en": 0.5, "de": 0.5}).collect())
    b = sorted((r["doc_id"], r["keep"]) for r in
               cu.stratified_sample(d, {"en": 0.5, "de": 0.5}).collect())
    assert a == b
    # a 0.5 rate keeps roughly half (hash uniformity, loose bound)
    n_half = sum(1 for _, k in a if k)
    assert 60 <= n_half <= 140


def test_rate_threshold_hex_bounds():
    assert cu.rate_threshold_hex(1.0) == "ffffffff"
    assert cu.rate_threshold_hex(0.0) == "00000000"
    assert cu.rate_threshold_hex(2.0) == "ffffffff"  # clamped


# -- token_budget_sample -----------------------------------------------------

def test_token_budget_sample_cumsum_and_boundary(spark):
    # every doc is exactly 4 BPE-ish tokens -> budget 10 keeps the
    # first 2 docs per stratum (cum 4, 8; third hits 12 > 10)
    rows = [(i, "aa bb cc dd", "en") for i in range(5)]
    d = _docs(spark, rows)
    out = cu.token_budget_sample(d, budget_tokens=10, strata_col="lang",
                                 content_col="text").collect()
    assert all(r["n_tokens"] == 4 for r in out)
    kept = [r for r in out if r["keep"]]
    assert len(kept) == 2
    cums = sorted(r["cum_tokens"] for r in out)
    assert cums == [4, 8, 12, 16, 20]
    # kept set is the hash-order prefix, deterministic across runs
    again = [r for r in cu.token_budget_sample(
        d, budget_tokens=10, strata_col="lang",
        content_col="text").collect() if r["keep"]]
    assert sorted(r["doc_id"] for r in again) == \
        sorted(r["doc_id"] for r in kept)


def test_token_budget_sample_per_stratum_budgets(spark):
    rows = [(i, "aa bb", "en" if i < 4 else "de") for i in range(8)]
    d = _docs(spark, rows)
    out = cu.token_budget_sample(d, budget_tokens=4, strata_col="lang",
                                 content_col="text")
    kept = out.filter("keep").groupBy("stratum").count().collect()
    by = {r["stratum"]: r["count"] for r in kept}
    assert by == {"en": 2, "de": 2}  # budget applies independently


def test_mixture_budgets_exact_integers():
    assert cu.mixture_budgets(4000, {"en": 0.5, "de": 0.2}) == \
        {"en": 2000, "de": 800}
    # floor, never round up: 3 * 0.33 = 0.99 -> 0
    assert cu.mixture_budgets(3, {"x": 0.33}) == {"x": 0}


def test_mixture_sample_splits_global_budget(spark):
    # 4-token docs; weights 0.75/0.25 over budget 16 -> en budget 12
    # (3 docs), de budget 4 (1 doc); zh unlisted -> budget 0, all drop
    rows = [(i, "aa bb cc dd",
             "en" if i < 5 else ("de" if i < 8 else "zh"))
            for i in range(10)]
    d = _docs(spark, rows)
    out = cu.mixture_sample(d, budget_tokens=16,
                            weights={"en": 0.75, "de": 0.25},
                            strata_col="lang", content_col="text")
    rows_out = out.collect()
    by_budget = {r["stratum"]: r["stratum_budget"] for r in rows_out}
    assert by_budget == {"en": 12, "de": 4, "zh": 0}
    kept = [r for r in rows_out if r["keep"]]
    per = {}
    for r in kept:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert per == {"en": 3, "de": 1}
    # within each stratum the kept set is the same hash-order prefix
    # token_budget_sample keeps under the same per-stratum budget
    twin = {(r["doc_id"]) for r in cu.token_budget_sample(
        d.filter(F.col("lang") == "en"), budget_tokens=12,
        strata_col="lang", content_col="text").collect() if r["keep"]}
    assert {r["doc_id"] for r in kept if r["stratum"] == "en"} == twin


# -- SQ8 ANN -----------------------------------------------------------------

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_sq_topk_matches_exact_on_separable_data(spark):
    # query (id 0) plus clusters: ids 1-3 near the query, 4-9 far
    import math
    q = [1.0, 0.0, 0.0, 0.0]
    near = [[0.9, 0.1 * i, 0.0, 0.0] for i in range(1, 4)]
    far = [[0.0, 0.0, 1.0, 0.1 * i] for i in range(6)]
    emb = _emb(spark, [q] + near + far)
    out = sim.sq_topk(emb, query_id=0, k=3, candidates=9)
    rows = out.collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert {r["vec_id"] for r in rows} == {1, 2, 3}
    # exact rescoring: rank-1 cosine equals hand-computed value
    v = near[0]
    cos = sum(a * b for a, b in zip(q, v)) / (
        math.sqrt(sum(a * a for a in q)) * math.sqrt(sum(a * a for a in v)))
    assert rows[0]["cosine"] == pytest.approx(round(cos, 6), abs=1e-6)


def test_sq_topk_quantized_candidates_recall(spark):
    # with candidates >= n-1 the SQ pass cannot miss: top-k equals the
    # exact cosine top-k
    import random
    rnd = random.Random(7)
    vecs = [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    emb = _emb(spark, vecs)
    sq = sim.sq_topk(emb, query_id=0, k=5, candidates=29).collect()
    exact = sim.cosine_topk(emb.filter("vec_id != 0"),
                            vecs[0], k=5).collect()
    assert [r["vec_id"] for r in sq] == [r["vec_id"] for r in exact]
    assert [r["cosine"] for r in sq] == [r["cosine"] for r in exact]


def test_sq_quantize_codes_in_range(spark):
    emb = _emb(spark, [[-2.0, 0.0], [0.0, 2.0], [1.0, -1.0]])
    stats = sim.sq_bounds(emb)
    codes = (emb.crossJoin(F.broadcast(stats))
             .select(sim.sq_quantize_col(F.col("embedding"),
                                         F.col("gmin"), F.col("gmax"))
                     .alias("c")).collect())
    flat = [x for r in codes for x in r["c"]]
    assert all(0 <= x <= 255 for x in flat)
    assert min(flat) == 0.0 and max(flat) == 255.0


# -- curation_funnel ---------------------------------------------------------

def test_curation_funnel_stage_priority(spark):
    # doc 1: too few tokens -> 'quality' wins even though repetitive
    # doc 2: quality-ok but heavily repetitive -> 'repetitive'
    # doc 3: quality-ok, contains the eval prompt -> 'contaminated'
    # doc 4: clean + sampled out (rate 0.0) -> 'sampled_out'
    # doc 5: clean + rate 1.0 -> kept
    long_tail = " ".join(f"w{i}" for i in range(20))
    prompt = "alpha beta gamma delta epsilon"
    rows = [
        (1, "ha ha ha", "keep"),
        (2, " ".join(["ab cd"] * 12), "keep"),
        (3, f"start {prompt} {long_tail}", "keep"),
        (4, f"plain {long_tail} the a it", "drop"),
        (5, f"other {long_tail} the a it", "keep"),
    ]
    d = _docs(spark, rows)
    ev = spark.createDataFrame([(prompt,)], "text string")
    out = {r["doc_id"]: r for r in cu.curation_funnel(
        d, ev, rates={"keep": 1.0, "drop": 0.0}, strata_col="lang",
        content_col="text").collect()}
    assert out[1]["drop_stage"] == "quality"
    assert out[2]["drop_stage"] == "repetitive"
    assert out[3]["drop_stage"] == "contaminated"
    assert out[4]["drop_stage"] == "sampled_out"
    assert out[5]["keep"] is True and out[5]["drop_stage"] is None


# -- chunking + packing ------------------------------------------------------

def test_chunk_documents_exact_windows(spark):
    d = _docs(spark, [
        (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en"),  # 10 tokens
        (2, "a b c", "en"),
        (3, "", "en"),          # empty -> no chunks
        (4, "solo", "en"),
    ])
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"],
         r["chunk_text"])
        for r in cu.chunk_documents(d, chunk_tokens=4, stride=4,
                                    content_col="text").collect())
    assert out == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, 4, "t4 t5 t6 t7"),
        (1, 2, 8, 2, "t8 t9"),
        (2, 0, 0, 3, "a b c"),
        (4, 0, 0, 1, "solo"),
    ]
    # overlapping windows: stride 2, chunk 4 — starts 0,2,4,...
    ov = sorted(
        (r["chunk_idx"], r["start_token"], r["n_tokens"])
        for r in cu.chunk_documents(
            d.filter(F.col("doc_id") == 1), chunk_tokens=4, stride=2,
            content_col="text").collect())
    assert ov == [(0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4), (4, 8, 2)]


def test_chunk_documents_covers_every_token(spark):
    d = _docs(spark, [(i, " ".join(f"x{j}" for j in range(5 + i * 7)), "en")
                      for i in range(8)])
    chunks = cu.chunk_documents(d, chunk_tokens=6, stride=6,
                                content_col="text")
    # disjoint windows: per-doc token mass equals the doc's token count
    got = {r["doc_id"]: r["t"] for r in
           chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("t"))
           .collect()}
    assert got == {i: 5 + i * 7 for i in range(8)}


def test_pack_sequences_streaming_cut(spark):
    d = _docs(spark, [
        (1, " ".join(f"w{j}" for j in range(10)), "en"),
        (2, " ".join(f"y{j}" for j in range(7)), "en"),
        (3, " ".join(f"z{j}" for j in range(5)), "en"),
    ])
    chunks = cu.chunk_documents(d, chunk_tokens=4, stride=4,
                                content_col="text")
    packed = cu.pack_sequences(chunks, context_tokens=8).collect()
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in packed}
    assert len(rows) == chunks.count()
    # reconstruct the stream in the window's deterministic order and
    # recompute pack/offset/straddle with plain ints (the twin)
    import hashlib

    def pri(doc, idx):
        return hashlib.sha256(f"{doc}:{idx}:s1".encode()).hexdigest()[:8]

    ordered = sorted(rows.values(),
                     key=lambda r: (pri(r["doc_id"], r["chunk_idx"]),
                                    r["doc_id"], r["chunk_idx"]))
    cum = 0
    for r in ordered:
        assert r["pack_id"] == cum // 8
        assert r["offset"] == cum % 8
        assert r["spans_boundary"] == (cum % 8 + r["n_tokens"] > 8)
        cum += r["n_tokens"]
    # every full pack holds exactly context tokens: total mass check
    assert cum == sum(r["n_tokens"] for r in ordered)


def test_pack_sequences_per_stratum_streams(spark):
    d = _docs(spark, [(i, " ".join(f"t{j}" for j in range(9)),
                       ["en", "de"][i % 2]) for i in range(6)])
    chunks = cu.chunk_documents(d, chunk_tokens=3, stride=3,
                                content_col="text")
    withlang = chunks.join(d.select("doc_id", "lang"), "doc_id")
    packed = cu.pack_sequences(withlang, context_tokens=9,
                               strata_col="lang")
    # streams are independent per stratum: each stratum's offsets
    # start at 0 and its token mass is self-contained
    agg = {r["stratum"]: r for r in
           packed.groupBy("stratum").agg(
               F.sum("n_tokens").alias("t"),
               F.min("offset").alias("mn")).collect()}
    assert set(agg) == {"en", "de"}
    for s in agg.values():
        assert s["mn"] == 0 and s["t"] == 27  # 3 docs x 9 tokens
