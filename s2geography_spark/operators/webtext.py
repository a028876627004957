"""URL canonicalization and host-level dedup for web-crawl corpora.

A Common-Crawl-scale pipeline dedups by URL before it dedups by content:
the same document is fetched under scheme/case variants, default ports,
`www.` aliases, tracking query parameters, fragments, and shuffled query
order.  This module canonicalizes URLs entirely with built-in Catalyst
expressions (regexp + array ops — no Python in the hot path), so the
canonical key is computed inside whole-stage codegen during the scan and
the dedup itself is a plain hash groupBy, the same 100 TB-safe shape as
``operators.dedup.exact_duplicate_groups``.

Scope (documented contract, mirrored by the driver oracle):

- scheme and host lowercased; the scheme is NEVER rewritten (http and
  https are different resources);
- default ports stripped (``:80`` for http, ``:443`` for https);
- a single leading ``www.`` label stripped from the host;
- the fragment dropped;
- known tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``igshid``, ``mc_eid``, ``ref``, ``ref_src``);
- remaining query parameters sorted bytewise (crawlers shuffle order);
- trailing slashes collapsed (``/a/`` -> ``/a``; a bare authority keeps
  path ``/``).

The per-parameter filter/sort uses ``F.filter``/``F.array_sort``, which
Spark evaluates interpreted per element — acceptable here because query
strings are a handful of elements, unlike the per-vertex geometry arrays
where the same construct measured 9x slower than Arrow (BENCH/BASELINE.md
negative result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "url_scheme", "url_host", "url_path", "url_query",
    "canonical_url", "registered_domain", "url_dedup_groups",
    "html_to_text",
]

# query parameters that never identify content (click/campaign trackers)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "igshid",
                   "mc_eid", "ref", "ref_src")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _col(c):
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url):
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(_col(url), _SCHEME_RE, 1))


def url_host(url):
    """Lowercased host with userinfo and port stripped."""
    auth = F.lower(F.regexp_extract(_col(url), _AUTH_RE, 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")   # userinfo
    return F.regexp_replace(auth, r":\d*$", "")     # any explicit port


def _port(url):
    auth = F.regexp_extract(_col(url), _AUTH_RE, 1)
    return F.regexp_extract(auth, r":(\d+)$", 1)


def url_path(url):
    """Path with trailing slashes collapsed; '/' when empty."""
    p = F.regexp_extract(_col(url), _PATH_RE, 1)
    p = F.regexp_replace(p, r"/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(url, *, drop_tracking: bool = True, sort: bool = True):
    """Query string with tracking params dropped and the rest sorted;
    '' when nothing survives."""
    q = F.regexp_extract(_col(url), _QUERY_RE, 1)
    parts = F.filter(F.split(q, "&"), lambda kv: F.length(kv) > 0)
    if drop_tracking:
        is_tracker = None
        for t in TRACKING_PARAMS:
            if t.endswith("_"):
                cond = lambda kv, t=t: kv.startswith(t)
            else:
                cond = lambda kv, t=t: kv.startswith(t + "=") | (kv == t)
            is_tracker = cond if is_tracker is None else (
                lambda kv, a=is_tracker, b=cond: a(kv) | b(kv))
        parts = F.filter(parts, lambda kv: ~is_tracker(kv))
    if sort:
        parts = F.array_sort(parts)
    return F.array_join(parts, "&")


def canonical_url(url):
    """Canonical form of an absolute http(s)-style URL (see module doc).

    Non-absolute values (no ``scheme://``) pass through unchanged so the
    expression is safe over dirty crawl columns.
    """
    u = _col(url)
    scheme = url_scheme(u)
    host = F.regexp_replace(url_host(u), r"^www\.", "")
    port = _port(u)
    keep_port = F.when(
        (port == "") | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit("")).otherwise(F.concat(F.lit(":"), port))
    q = url_query(u)
    canon = F.concat(
        scheme, F.lit("://"), host, keep_port, url_path(u),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return F.when(scheme == "", u).otherwise(canon)


def registered_domain(host):
    """Registrable domain by suffix heuristic: the last two labels, or the
    last three when the second-to-last is a generic second-level label
    under a two-letter ccTLD (``example.co.uk`` -> ``example.co.uk``).  A
    full public-suffix list is a deploy-time swap-in; the heuristic keeps
    the expression pure-Column."""
    h = _col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    is_2l_suffix = second.isin("co", "com", "net", "org", "ac", "gov",
                               "edu") & (F.length(tld) == 2) & (n >= 3)
    take = F.when(is_2l_suffix, F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= 2, h).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), "."))


_BLOCK_CLOSE_RE = (r"(?i)(<br\s*/?>|</(p|div|li|tr|h[1-6]|title|section|"
                   r"article|blockquote|pre|table)\s*>)")

_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
             ("&amp;", "&"))  # &amp; LAST so '&amp;lt;' -> '&lt;' literal


def html_to_text(html):
    """Boilerplate-stripped visible text from an HTML column, entirely in
    Catalyst regexp/array expressions (codegen'd in the scan stage — the
    extraction that usually dominates a crawl pipeline's CPU never leaves
    the JVM).

    Semantics (the documented contract, mirrored by the driver oracle):
    script/style elements and comments are dropped wholesale (their
    content is code, not text — including literal ``<`` and quotes that
    would confuse a naive tag regex); block-closing tags and ``<br>``
    become newlines; all remaining tags are removed; the common HTML
    entities are decoded (``&amp;`` last, so double-escaped text stays
    escaped once, matching a correct one-pass decoder); horizontal
    whitespace runs collapse to one space, lines are trimmed, and blank
    lines are dropped.

    This is a regexp extractor, not an HTML5 parser: unbalanced comments
    or CDATA inside scripts follow the regexp's interpretation.  That is
    the standard trade for scan-stage extraction; a DOM pass belongs in a
    mapInPandas stage downstream for the tiny fraction of pages that need
    one.
    """
    t = _col(html)
    # drop script/style bodies ((?s): dot spans newlines) and comments
    t = F.regexp_replace(
        t, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, _BLOCK_CLOSE_RE, "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        t = F.regexp_replace(t, ent, ch)
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    lines = F.transform(F.split(t, r"\n"), lambda x: F.trim(x))
    return F.array_join(F.filter(lines, lambda x: F.length(x) > 0), "\n")


def cap_per_group(df: DataFrame, keys, order_by, k: int,
                  rank_col: str | None = None) -> DataFrame:
    """Keep at most k rows per group — the per-domain quota stage every
    crawl pipeline runs so one mega-site cannot dominate the corpus.

    One shuffle on the group key + a per-group sort bounded by the
    group's own size (window row_number, no global sort).  `order_by`
    must be a DETERMINISTIC total order (tie-break on a unique id) or
    reruns keep different rows.  Skew note: a single giant domain lands
    on one partition for its sort; with k small the right scale fix is a
    two-phase cap (cap at k per PARTITION pre-shuffle — cheap, preserves
    correctness since the per-partition top-k is a superset of each
    group's global top-k — then the exact window on the survivors).
    """
    from pyspark.sql.window import Window
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") <= int(k))
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def url_dedup_groups(df: DataFrame, url: str = "url",
                     id_col: str = "doc_id",
                     canon_col: str | None = None) -> DataFrame:
    """Group rows by canonical URL: one row per group with the member
    count and the minimum id as the canonical keeper.  Plain hash groupBy
    on a codegen'd key — partial aggregation map-side, one exchange on the
    canonical key, no skew risk beyond genuinely mass-duplicated URLs.

    canon_col: name of an ALREADY-computed canonical-URL column (r6: a
    caller that also projects per-row canonical columns should derive the
    groups from that projection instead of paying the full regexp chain —
    and its codegen compilation — a second time)."""
    if canon_col is None:
        df = df.withColumn("canon_url", canonical_url(url))
    elif canon_col != "canon_url":
        df = df.withColumn("canon_url", F.col(canon_col))
    return (df
            .groupBy("canon_url")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id")))
