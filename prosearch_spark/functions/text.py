"""URL / text scalar transforms (reference T6-T11, P7).

Each is a pure column expression with a 1:1 regexp-based SQL oracle
(no parse_url dependence, so the DuckDB mirror is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_normalize(url: Column | str) -> Column:
    """T6 (CrawlerRunner.java:26-38) — the expressible subset:
    removeFragment, lowerCaseSchemeHost, removeDefaultPort,
    removeDuplicateSlashes (path only). Dot-segment removal and
    escape-sequence normalization need stateful parsing and live in
    the crawler, not the index; they are documented out of scope.
    """
    u = _c(url)
    u = F.regexp_replace(u, r"#.*$", "")  # removeFragment
    # lowerCaseSchemeHost: lower the scheme://host[:port] prefix
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", ""),
    )
    # removeDefaultPort (no lookahead: the oracle dialect is RE2)
    u = F.regexp_replace(u, r"^(https?://[^/:?#]+):(80|443)([/?#].*)?$", r"$1$3")
    # removeDuplicateSlashes in the path (not the scheme's //)
    u = F.concat(
        F.regexp_extract(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1),
        F.regexp_replace(
            F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://[^/?#]*", ""),
            r"//+", "/",
        ),
    )
    return u


def host_of(url: Column | str) -> Column:
    """T7 (Host.java:20-30): authority extraction."""
    return F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)


def scheme_strip(url: Column | str) -> Column:
    """T8 (Manager.java:304-317): authority + path + ?query, scheme and
    fragment dropped."""
    u = F.regexp_replace(_c(url), r"#.*$", "")
    return F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")


def title_fallback(title: Column | str, url: Column | str) -> Column:
    """T10 (TantivyClient.java:139-143): empty/missing title -> url."""
    t = _c(title)
    return F.coalesce(F.nullif(F.trim(t), F.lit("")), _c(url))


def content_length(title: Column | str, body: Column | str) -> Column:
    """T11 (serve.rs:495-517): indexed length = len(body)+len(title),
    persisted per URL as domain_stats.length."""
    return (F.length(_c(body)) + F.length(_c(title))).cast("long")


def has_start_url_format(url: Column | str) -> Column:
    """P7 (Manager.java:189-207): path in {null, '', '/'}, no query,
    no fragment — the 'is this a site root' predicate."""
    return _c(url).rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+/?$")
