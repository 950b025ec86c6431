"""URL canonicalization edge cases (the planted contract URLs are
regular; these pin the operator on the irregular shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import urls


def _one(spark, url):
    return (
        spark.createDataFrame([(url,)], ["url"])
        .select(
            urls.canonicalize_url(F.col("url")).alias("c"),
            urls.url_host(F.col("url")).alias("h"),
            urls.registered_domain(urls.url_host(F.col("url"))).alias("d"),
        )
        .collect()[0]
    )


def test_canonicalize_scrubs_tracking_and_fragment(spark):
    r = _one(
        spark,
        "https://WWW.Site.ORG/a/b?utm_campaign=x&keep=1&ref=abc&also=2#sec",
    )
    assert r.c == "https://www.site.org/a/b?keep=1&also=2"
    assert r.h == "www.site.org" and r.d == "site.org"


def test_canonicalize_no_query_no_trailing_question_mark(spark):
    assert _one(spark, "http://Example.com/x#top").c == "http://example.com/x"


def test_canonicalize_all_params_tracking_drops_query_entirely(spark):
    r = _one(spark, "https://a.b.c.example.com/p?utm_source=x&ref=1")
    assert r.c == "https://a.b.c.example.com/p"
    assert r.d == "example.com"  # deep subdomains collapse to last two


def test_registered_domain_single_label_host(spark):
    assert _one(spark, "http://localhost/x").d == "localhost"


def test_http_scheme_preserved(spark):
    assert _one(spark, "http://A.B/x").c.startswith("http://a.b")
