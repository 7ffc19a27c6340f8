"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure column expressions (JVM-side, oracle-mirrorable). The
whitespace-collapse transform replicates the reference importer's
``AbstractStringTransformer`` stage (CrawlerRunner.java:155-175); the
content-length accounting replicates T11 (serve.rs:495-517 ->
domain_stats.length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prosearch_spark.analyzer import white_lower_tokens

# tiny per-language stopword marker sets for the n-gram-free heuristic
# language identifier (deterministic, SQL-mirrorable).
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "y", "de"),
}


def whitespace_collapse(col: Column | str) -> Column:
    """T3: ``(\\s)+ -> ' '`` + trim (CrawlerRunner.java:155-175)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def content_length(title: Column | str, body: Column | str) -> Column:
    """T11: indexed content length = len(body) + len(title)
    (serve.rs:513-517)."""
    t = F.col(title) if isinstance(title, str) else title
    b = F.col(body) if isinstance(body, str) else body
    return (F.length(t) + F.length(b)).cast("long")


def token_count(col: Column | str) -> Column:
    return F.size(white_lower_tokens(col)).cast("long")


# GPT-2-style pre-tokenizer pattern, RE2-compatible subset (no
# lookahead, no \p classes): contractions, letter runs, digit runs,
# punctuation runs — the standard BPE pre-split shape.
BPE_ISH_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate LLM token count: number of BPE-style pre-tokens.
    A corpus-costing primitive for training-data pipelines (the real
    merge table would live in a broadcast map; the pre-split dominates
    the count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), F.lit(0))).cast("long")


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = ("the", "a")) -> Column:
    toks = white_lower_tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def avg_token_len(col: Column | str) -> Column:
    toks = white_lower_tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / \
        F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality: long-enough, low punctuation, sane
    stopword ratio. Heuristic for training-data filtering."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    stop = stopword_ratio(c)
    stop_ok = F.when((stop > 0.01) & (stop < 0.5), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_pen + stop_ok) / F.lit(3.0), 6)


def lang_id(col: Column | str) -> Column:
    """Marker-stopword language guess; 'und' (undetermined) if no
    marker wins."""
    toks = white_lower_tokens(col)

    def marker_count(markers: tuple[str, ...]):
        # NB: the F.filter lambda must take exactly one parameter — a
        # second parameter would be bound to the element index.
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    counts = {lang: marker_count(m) for lang, m in _LANG_MARKERS.items()}
    best_count = F.greatest(*counts.values())
    result = F.lit("und")
    # deterministic priority order on ties: en, de, es, fr (alpha after en)
    for lang in ["fr", "es", "de", "en"]:
        result = F.when((counts[lang] > 0) & (counts[lang] == best_count),
                        F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column | str) -> Column:
    """Order-invariant document fingerprint: md5 of the sorted distinct
    token set (robust to reordering/whitespace; md5 is cross-engine)."""
    toks = white_lower_tokens(col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def text_stats(docs: DataFrame, content_col: str = "content",
               id_col: str = "doc_id") -> DataFrame:
    """One pass emitting every per-doc text statistic."""
    c = F.col(content_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(c).alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(avg_token_len(c), 6).alias("avg_token_len"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


# Gopher-style hard rule thresholds for quality_filter (compared on
# ratios ROUNDED to 6dp so the engine/oracle comparison is a grid
# compare, never a last-ulp coin flip at a threshold boundary).
QF_MIN_TOKENS = 5
QF_MAX_STOPWORD_RATIO = 0.6
QF_MAX_PUNCT_RATIO = 0.2
QF_MIN_AVG_TOKEN_LEN = 2.0
QF_MAX_AVG_TOKEN_LEN = 12.0


def quality_filter(col: Column | str) -> Column:
    """Training-data hard filter (Gopher-rule shape): struct<keep:
    boolean, reject_reason: string>. The FIRST failing rule names the
    reason (fixed priority: too_few_tokens, stopword_heavy,
    punct_heavy, token_len_out_of_range); reason is NULL when kept.
    Pure column expressions — one corpus scan filters 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    stop_r = F.round(stopword_ratio(c), 6)
    punct_r = F.round(punct_ratio(c), 6)
    avg_l = F.round(avg_token_len(c), 6)
    reason = (
        F.when(n_tok < QF_MIN_TOKENS, F.lit("too_few_tokens"))
        .when(stop_r > QF_MAX_STOPWORD_RATIO, F.lit("stopword_heavy"))
        .when(punct_r > QF_MAX_PUNCT_RATIO, F.lit("punct_heavy"))
        .when((avg_l < QF_MIN_AVG_TOKEN_LEN)
              | (avg_l > QF_MAX_AVG_TOKEN_LEN),
              F.lit("token_len_out_of_range"))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(reason.isNull().alias("keep"),
                    reason.alias("reject_reason"))
