"""URL handling for web-provenance pipelines (EXT, SURVEY §2B).

Web-scale training corpora carry a URL per document; the standard
pipeline needs (a) component extraction, (b) canonicalization — case
normalization of the host, tracking-parameter ("utm_*", "ref")
removal, fragment drop — so URL-level dedup and per-domain statistics
see through superficial variation, and (c) a registered-domain
grouping key. All JVM-side: ``parse_url`` for the components, a
higher-order ``filter`` over the split query string for the
tracking-param scrub (array functions over a handful of params, not the
interpreted-HOF-over-large-arrays trap).

The registered-domain heuristic is the last two host labels — correct
for .com/.org/etc., deliberately NOT a public-suffix-list
implementation (that is a data file, not an algorithm; the cut point is
documented and the tests pin it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "ref=", "ref_")


def url_host(url: Column | str) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_path(url: Column | str) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def _is_tracking(param: Column) -> Column:
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | param.startswith(p)
    return cond


def clean_query(url: Column | str) -> Column:
    """Query string with tracking params removed, original order kept;
    empty string when nothing survives (or no query existed)."""
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(q, "&"), lambda p: (p != "") & ~_is_tracking(p)
    )
    return F.array_join(kept, "&")


def canonicalize_url(url: Column | str) -> Column:
    """scheme://lower(host)path[?clean_query] — fragment dropped (never
    reassembled), tracking params scrubbed, host case-folded. Scheme is
    preserved as-is (http/https distinction is real provenance)."""
    scheme = F.parse_url(url, F.lit("PROTOCOL"))
    q = clean_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        url_host(url),
        F.coalesce(url_path(url), F.lit("")),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column | str) -> Column:
    """Last two dot-labels of the (lowercased) host — the grouping key
    for per-site statistics. Public-suffix awareness would swap this
    expression for a broadcast-joined suffix table; the pipeline shape
    is identical."""
    parts = F.split(F.lower(host) if isinstance(host, str) else F.lower(host), "\\.")
    n = F.size(parts)
    return F.when(n <= 2, F.array_join(parts, ".")).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )
