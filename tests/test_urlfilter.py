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


GOOD_URLS = [
    "https://h.example.com/p/1",
    "https://h.example.com/",
    "https://h.example.com/a/b/c?x=1",
    "https://h.example.com/p/123",           # digit_frac exactly 0.5
]
BAD_URLS = [
    "https://h.example.com/private/1",
    "https://h.example.com/x?session=abc",
    "https://h.example.com/20240101/2024/2024",
    "https://blocked.example.com/p/1",
]
BLOCKED = ("blocked.example.com",)


def test_twin_matches_spark_column(spark):
    from pink_spider_spark.crawl.urlfilter import is_url_allowed

    df = _urls(spark, GOOD_URLS + BAD_URLS)
    bl = spark.createDataFrame([(h,) for h in BLOCKED], ["host"])
    got = {r.url: r.allowed
           for r in url_signals(df, blocklist=bl).collect()}
    for u in GOOD_URLS + BAD_URLS:
        assert got[u] == is_url_allowed(u, BLOCKED), u
    assert [is_url_allowed(u, BLOCKED) for u in GOOD_URLS] == [True] * 4
    assert [is_url_allowed(u, BLOCKED) for u in BAD_URLS] == [False] * 4


import pytest  # noqa: E402


@pytest.mark.parametrize("flag", [True, False])
def test_crawl_url_filter_parity(spark, flag):
    """Enqueue-time URL triage: Spark driver and sequential simulator
    drop the same links (banned word + blocked host), bit-identical
    seen tables with the flag on and off."""
    import shutil
    import tempfile

    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.crawl.simulator import simulate
    from pink_spider_spark.sources.synth import build_catalog_items
    from pink_spider_spark.sources.tables import TableStore

    items = build_catalog_items()
    seed = "https://hosta.example.com/p0"
    banned_url = "https://hosta.example.com/private/x"
    blocked_url = "https://hostb.example.com/p1"
    ok_url = "https://hosta.example.com/ok"
    para = "Plain filler text, long enough to score as content. " * 3
    pages = {
        seed: (f'<html><body><p>{para}</p><a href="{banned_url}">a</a>'
               f'<a href="{blocked_url}">b</a>'
               f'<a href="{ok_url}">ok</a></body></html>'),
        banned_url: f"<html><body><p>{para}</p></body></html>",
        blocked_url: f"<html><body><p>{para}</p></body></html>",
        ok_url: f"<html><body><p>{para}</p></body></html>",
    }
    robots = {"hosta.example.com": {"disallow_prefixes": [],
                                    "max_per_wave": 16},
              "hostb.example.com": {"disallow_prefixes": [],
                                    "max_per_wave": 16}}
    pages_df = spark.createDataFrame(list(pages.items()), ["url", "html"])
    robots_df = spark.createDataFrame(
        [(h, r["disallow_prefixes"], r["max_per_wave"])
         for h, r in robots.items()],
        "host string, disallow_prefixes array<string>, max_per_wave int")
    blocked = ("hostb.example.com",)
    root = tempfile.mkdtemp(prefix="urlf_crawl_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=2, max_waves=5,
                                         url_filter=flag,
                                         blocked_hosts=blocked))
        driver.run([seed])
        spark_seen = {(r["url"], r["first_wave"], r["seq"])
                      for r in store.table("seen").read(spark).collect()}
        sim = simulate(pages, robots, items, [seed], max_depth=2,
                       max_waves=5, url_filter=flag, blocked_hosts=blocked)
        assert spark_seen == set(sim.seen)
        urls = {u for (u, _, _) in spark_seen}
        assert ok_url in urls
        assert (banned_url in urls) == (not flag)
        assert (blocked_url in urls) == (not flag)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------------------------------------ SURT
def test_surt_canonical_forms(spark):
    from pink_spider_spark.crawl.urlfilter import surt, surt_domain_key
    from pyspark.sql import functions as F
    cases = {
        "http://www.Example.COM:8080/A?q": "com,example,www,:8080)/a?q",
        "https://example.com": "com,example)/",
        "https://a.b.example.net/x/y": "net,example,b,a)/x/y",
        "http://example.org/": "org,example)/",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    out = {r.url: r.s for r in
           df.select("url", surt(F.col("url")).alias("s")).collect()}
    assert out == cases
    dk = {r.url: r.d for r in
          df.select("url",
                    surt_domain_key(F.col("url")).alias("d")).collect()}
    assert dk["https://a.b.example.net/x/y"] == "net,example"
    assert dk["http://www.Example.COM:8080/A?q"] == "com,example"


def test_surt_domain_prefix_property(spark):
    # the point of SURT: every subdomain/path of one domain sorts inside
    # a contiguous prefix range, where plain URLs scatter
    from pink_spider_spark.crawl.urlfilter import surt
    from pyspark.sql import functions as F
    urls = ["https://www.shop.example.com/a", "https://example.com/z",
            "https://cdn.example.com/img", "https://examplezzz.com/x",
            "https://aaa.org/q"]
    rows = (spark.createDataFrame([(u,) for u in urls], ["url"])
            .select(surt(F.col("url")).alias("s")).collect())
    surts = sorted(r.s for r in rows)
    in_domain = [s for s in surts
                 if s.startswith("com,example,") or
                 s.startswith("com,example)")]
    # contiguous: the in-domain keys occupy consecutive sorted slots
    idx = [surts.index(s) for s in in_domain]
    assert idx == list(range(min(idx), min(idx) + len(in_domain)))
    # and the lookalike domain examplezzz is NOT inside the range
    assert not any(s.startswith("com,example,") or s.startswith("com,example)")
                   for s in surts if "examplezzz" in s)
