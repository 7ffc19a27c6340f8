"""URL / text scalar transforms (reference T6-T11, P7).

Each is a pure column expression with a 1:1 regexp-based SQL oracle
(no parse_url dependence, so the DuckDB mirror is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# dot-segment removal (RFC 3986 §5.2.4) as a BOUNDED REWRITE. Each of
# the rules below performs only RFC-valid reductions (removing /./
# anywhere, popping a REAL segment before /../, dropping a leading
# /../) — the rewrite system is confluent, so iterating to a fixed
# point yields exactly the RFC result. _SEG matches any path segment
# EXCEPT '.' and '..' (a literal dot-dir consumed as the popped
# segment was the round-2 review's fuzz-confirmed bug): it must start
# with a non-dot, or be '.x...', or be '..x...'. A leading RUN of /../
# collapses in one rule application (adversarial mass-'..' prefixes
# don't consume passes); the residual bound is nesting depth of real
# seg/.. pairs — DOT_PASSES covers ~16 nested pops (33+ segments of
# pure climb shenanigans beyond that stay partially reduced, but
# IDENTICALLY on both engines: the identical pass count and replace-ALL
# semantics make engine == oracle by construction, and pytest fuzzes
# the fully-reduced regime against a pure RFC 5.2.4 Python twin).
DOT_PASSES = 16
_SEG = r"(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)"
_DOT_RULES = [
    (r"/\./", "/"),               # /a/./b -> /a/b
    (r"/\.$", "/"),               # /a/.   -> /a/
    (rf"/{_SEG}/\.\./", "/"),     # /a/../ -> /   (a != '.', '..')
    (rf"/{_SEG}/\.\.$", "/"),     # /a/..  -> /
    (r"^(?:/\.\.)+/", "/"),       # leading /../../... run -> /
    (r"^(?:/\.\.)+$", "/"),       # bare /../.. run       -> /
]


def _remove_dot_segments_col(path: Column) -> Column:
    """PRECONDITION: ``path`` is authority-rooted (starts with '/') or
    empty. Every _DOT_RULES pattern anchors on a leading '/', so an
    UNROOTED relative path (e.g. 'a/../b') is silently left unreduced
    while remove_dot_segments_py fully reduces it per RFC 3986 §5.2.4.
    url_normalize only ever feeds the post-authority path slice, which
    satisfies this; a new caller with relative paths must root them
    first (tests/test_properties.py pins the twin agreement on the
    rooted domain)."""
    p = path
    for _ in range(DOT_PASSES):
        for pat, rep in _DOT_RULES:
            p = F.regexp_replace(p, pat, rep)
    return p


def remove_dot_segments_sql(expr: str) -> str:
    """DuckDB twin of :func:`_remove_dot_segments_col` — the same rules
    in the same order with the 'g' (replace-all) flag. Same
    PRECONDITION: ``expr`` must evaluate to a '/'-rooted (or empty)
    path; unrooted leading segments are not reduced."""
    p = expr
    for _ in range(DOT_PASSES):
        for pat, rep in _DOT_RULES:
            # DuckDB standard strings don't process backslashes — emit
            # the Java-regex pattern verbatim (RE2-compatible subset)
            sql_pat = pat.replace("'", "''")
            p = f"regexp_replace({p}, '{sql_pat}', '{rep}', 'g')"
    return p


def remove_dot_segments_py(path: str) -> str:
    """Pure RFC 3986 §5.2.4 implementation — the test oracle for the
    bounded-rewrite formulation above."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1)
            seg, buf = (buf, "") if i < 0 else (buf[:i], buf[i:])
            out.append(seg)
    return "".join(out)


def url_normalize(url: Column | str) -> Column:
    """T6 (CrawlerRunner.java:26-38): removeFragment,
    lowerCaseSchemeHost, removeDefaultPort, removeDuplicateSlashes
    (path only), removeDotSegments (path only, before the query).
    Escape-sequence normalization needs stateful percent parsing and
    stays documented out of scope.
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
    # removeDotSegments on the PATH only (query/fragment untouched)
    prefix = F.regexp_extract(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    tail = F.regexp_replace(rest, r"^[^?#]*", "")
    return F.concat(prefix, _remove_dot_segments_col(path), tail)


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


# T9 entity table — ONE source of truth for the Spark expression, the
# DuckDB SQL emitter, and the Python twin the snippet renderer uses.
# ``&`` first, or already-escaped entities would double-escape.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
    ('"', "&quot;"), ("'", "&#39;"),
]


def html_escape(col: Column | str) -> Column:
    """T9 (SERP rendering, SearchPage.java analog): escape the five
    HTML-special characters."""
    c = _c(col)
    for raw, ent in HTML_ENTITIES:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def html_escape_py(s: str) -> str:
    """Python twin (used by the snippet renderer and tests)."""
    for raw, ent in HTML_ENTITIES:
        s = s.replace(raw, ent)
    return s


def html_escape_sql(expr: str) -> str:
    """DuckDB twin generated from the same entity table."""
    out = expr
    for raw, ent in HTML_ENTITIES:
        out = (f"replace({out}, '{raw.replace(chr(39), chr(39) * 2)}', "
               f"'{ent.replace(chr(39), chr(39) * 2)}')")
    return out


def has_start_url_format(url: Column | str) -> Column:
    """P7 (Manager.java:189-207): path in {null, '', '/'}, no query,
    no fragment — the 'is this a site root' predicate."""
    return _c(url).rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+/?$")
