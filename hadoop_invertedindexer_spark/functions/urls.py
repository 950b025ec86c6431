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

Registered-domain extraction comes in two forms: the default
pure-expression heuristic (last two host labels — correct for
.com/.org/etc.) and :func:`with_registered_domain_psl`, which
broadcast-joins a bundled public-suffix table
(``data/public_suffixes.txt``) so co.uk/com.au-style hosts group
correctly; swap the data file for a full publicsuffix.org extract in
production.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "ref=", "ref_")

_SUFFIX_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffixes.txt",
)


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
    """scheme://[userinfo@]lower(host)[:port]path[?clean_query] —
    fragment dropped (never reassembled), tracking params scrubbed, host
    case-folded. Scheme is preserved as-is (http/https distinction is
    real provenance), and so are an explicit port and userinfo:
    ``parse_url(_, 'HOST')`` excludes both, so without re-appending them
    two distinct origins (host:8080 vs host) would collapse to one
    canonical URL in dedup and domain stats. ``parse_url(_, 'PORT')``
    is always null in Spark 4.x (java.net.URI quirk), so the port is
    taken from the tail of AUTHORITY instead; userinfo keeps its
    original case (it is case-sensitive per RFC 3986)."""
    scheme = F.parse_url(url, F.lit("PROTOCOL"))
    userinfo = F.parse_url(url, F.lit("USERINFO"))
    port = F.regexp_extract(
        F.parse_url(url, F.lit("AUTHORITY")), ":(\\d+)$", 1
    )
    q = clean_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        F.when(
            userinfo.isNotNull(), F.concat(userinfo, F.lit("@"))
        ).otherwise(F.lit("")),
        url_host(url),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.coalesce(url_path(url), F.lit("")),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column | str) -> Column:
    """Last two dot-labels of the (lowercased) host — the grouping key
    for per-site statistics. Pure-expression form: fast (whole-stage
    codegen, no join) but wrong for co.uk/com.au-style two-label public
    suffixes; use :func:`with_registered_domain_psl` when the corpus
    has real ccTLD traffic."""
    parts = F.split(F.lower(host), "\\.")
    n = F.size(parts)
    return F.when(n <= 2, F.array_join(parts, ".")).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


@lru_cache(maxsize=1)
def load_public_suffixes(path: str = _SUFFIX_FILE) -> tuple[str, ...]:
    """Two-label public suffixes from the bundled data file (or a
    caller-supplied full PSL extract): non-blank, non-# lines,
    lowercased. Cached — the file is read once per process."""
    with open(path, encoding="utf-8") as fh:
        return tuple(
            line.strip().lower()
            for line in fh
            if line.strip() and not line.startswith("#")
        )


def public_suffix_table(
    spark: SparkSession, path: str = _SUFFIX_FILE
) -> DataFrame:
    """One-column (suffix) DataFrame of the bundled two-label public
    suffixes — small (hundreds of rows; the full PSL is ~10k), built for
    the broadcast side of :func:`with_registered_domain_psl`."""
    return spark.createDataFrame(
        [(s,) for s in load_public_suffixes(path)], ["suffix"]
    )


def with_registered_domain_psl(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Public-suffix-aware registered domain via a BROADCAST left join
    (ADVICE r5: the last-two-labels heuristic is wrong for
    co.uk/com.au-style hosts a real web corpus is full of).

    Rule: when the host's last TWO labels are a listed public suffix and
    a third label exists, the registered domain is the last THREE
    labels (news.bbc.co.uk -> bbc.co.uk); otherwise the last-two-labels
    default applies (single-label TLDs need no table). A host that IS
    a bare public suffix (host == 'co.uk') has no registrable part and
    keeps itself as the key. The corpus side never shuffles: the suffix
    table is broadcast and the join key is a derived column."""
    spark = df.sparkSession
    suf = suffixes if suffixes is not None else public_suffix_table(spark)
    parts = F.split(F.lower(F.col(host_col)), "\\.")
    n = F.size(parts)
    last2 = F.when(
        n <= 2, F.array_join(parts, ".")
    ).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    tagged = df.withColumn("_rd2", last2).withColumn(
        "_rd3", F.when(n >= 3, last3)
    )
    joined = tagged.join(
        F.broadcast(suf.withColumnRenamed("suffix", "_rd_suffix")),
        tagged["_rd2"] == F.col("_rd_suffix"),
        "left",
    )
    return joined.withColumn(
        out_col,
        F.when(
            F.col("_rd_suffix").isNotNull() & F.col("_rd3").isNotNull(),
            F.col("_rd3"),
        ).otherwise(F.col("_rd2")),
    ).drop("_rd2", "_rd3", "_rd_suffix")
