"""Unit tests for crawl/urlfilter.py (URL-level corpus triage)."""

from pyspark.sql import functions as F

from pink_spider_spark.crawl.urlfilter import url_signals


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_url_signals_banned_words_and_case(spark):
    df = _urls(spark, [
        "https://a.example.com/p/1",
        "https://a.example.com/CART/view",       # case-insensitive hit
        "https://a.example.com/x?session=abc",   # query words count too
        "https://a.example.com/private/logout",  # two hits
    ])
    out = {r.url: r for r in url_signals(df).collect()}
    assert out["https://a.example.com/p/1"].banned_hits == 0
    assert out["https://a.example.com/CART/view"].banned_hits == 1
    assert out["https://a.example.com/x?session=abc"].banned_hits == 1
    assert out["https://a.example.com/private/logout"].banned_hits == 2
    assert out["https://a.example.com/p/1"].allowed
    assert not out["https://a.example.com/CART/view"].allowed


def test_url_signals_digit_frac_path_only(spark):
    # digits in the HOST or QUERY never count; /p/123 path is 3 digits
    # over 6 path chars
    df = _urls(spark, ["https://h99.example.com/p/123?x=4567",
                       "https://h.example.com/20240101/20240102/2024"])
    out = {r.url: r for r in url_signals(df).collect()}
    a = out["https://h99.example.com/p/123?x=4567"]
    assert a.digit_frac == 0.5 and a.allowed
    b = out["https://h.example.com/20240101/20240102/2024"]
    assert b.digit_frac > 0.5 and not b.allowed


def test_url_signals_blocklist_broadcast_join(spark):
    df = _urls(spark, ["https://bad.example.com/p/1",
                       "https://BAD.example.com/p/2",   # host lowercased
                       "https://good.example.com/p/3"])
    bl = spark.createDataFrame([("bad.example.com",)], ["host"])
    out = {r.url: r for r in url_signals(df, blocklist=bl).collect()}
    assert out["https://bad.example.com/p/1"].blocked_host
    assert out["https://BAD.example.com/p/2"].blocked_host
    assert not out["https://good.example.com/p/3"].blocked_host
    assert out["https://good.example.com/p/3"].allowed


def test_url_signals_rootless_url_no_path(spark):
    # no path at all: digit_frac 0 (guarded division), allowed
    df = _urls(spark, ["https://h.example.com"])
    r = url_signals(df).collect()[0]
    assert r.digit_frac == 0.0 and r.host == "h.example.com" and r.allowed
