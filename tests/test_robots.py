"""robots.txt ingestion: raw bodies -> broadcast rules table.

Parser semantics pinned against RFC 9309 group selection; the Spark
table derived from synthetic raw bodies must reproduce the structured
robots_rows fixture field-for-field, and a crawl driven by the parsed
table must match the sequential simulator fed from the same bytes.
"""

import shutil
import tempfile

import pytest

from pink_spider_spark.crawl import scheduler
from pink_spider_spark.crawl.robots import (
    DEFAULT_MAX_PER_WAVE,
    crawl_delay_to_budget,
    parse_robots_txt,
    robots_dict_from_bodies,
    robots_table_from_bodies,
)
from pink_spider_spark.sources.synth import robots_rows, robots_txt_bodies


# ------------------------------------------------------------ pure parse
def test_plain_star_group():
    r = parse_robots_txt("User-agent: *\nDisallow: /private\nCrawl-delay: 2\n")
    assert r["disallow_prefixes"] == ["/private"]
    assert r["crawl_delay"] == 2.0


def test_specific_agent_overrides_star():
    body = (
        "User-agent: *\nDisallow: /a\nCrawl-delay: 30\n\n"
        "User-agent: pink-spider\nDisallow: /b\nDisallow: /c\n"
    )
    r = parse_robots_txt(body, agent="pink-spider")
    assert r["disallow_prefixes"] == ["/b", "/c"]
    assert r["crawl_delay"] is None  # specific group has no delay


def test_foreign_agent_group_ignored():
    r = parse_robots_txt("User-agent: megabot\nDisallow: /\n")
    assert r["disallow_prefixes"] == []


def test_stacked_agent_lines_share_group():
    body = "User-agent: foobot\nUser-agent: *\nDisallow: /x\n"
    assert parse_robots_txt(body)["disallow_prefixes"] == ["/x"]


def test_empty_disallow_means_allow_all():
    assert parse_robots_txt("User-agent: *\nDisallow:\n")["disallow_prefixes"] == []


def test_comments_and_inline_comments_stripped():
    body = "# header\nUser-agent: *\nDisallow: /private # members\n"
    assert parse_robots_txt(body)["disallow_prefixes"] == ["/private"]


def test_sitemaps_collected_globally():
    body = (
        "Sitemap: https://h/s1.xml\nUser-agent: megabot\nDisallow: /\n"
        "Sitemap: https://h/s2.xml\n"
    )
    r = parse_robots_txt(body)
    assert r["sitemaps"] == ["https://h/s1.xml", "https://h/s2.xml"]


def test_rules_before_any_agent_line_ignored():
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nDisallow: /y\n")[
        "disallow_prefixes"] == ["/y"]


def test_bytes_body_with_bad_utf8_decodes_lossy():
    body = b"User-agent: *\nDisallow: /caf\xe9\n"  # latin-1 stray byte
    r = parse_robots_txt(body)
    assert r["disallow_prefixes"] == ["/caf�"]


def test_case_insensitive_fields_and_agent():
    body = "USER-AGENT: Pink-Spider\nDISALLOW: /p\nCRAWL-DELAY: 1.5\n"
    r = parse_robots_txt(body, agent="pink-spider")
    assert r["disallow_prefixes"] == ["/p"]
    assert r["crawl_delay"] == 1.5


def test_delay_to_budget():
    assert crawl_delay_to_budget(None) == DEFAULT_MAX_PER_WAVE
    assert crawl_delay_to_budget(1.0, wave_seconds=64.0) == 64
    assert crawl_delay_to_budget(4.0, wave_seconds=64.0) == 16
    assert crawl_delay_to_budget(1e-9) == 1024  # capped, never unbounded
    assert crawl_delay_to_budget(1e9) == 1      # floor of 1


def test_default_budget_matches_scheduler_default():
    assert DEFAULT_MAX_PER_WAVE == scheduler.DEFAULT_MAX_PER_WAVE


# ------------------------------------------------------------ spark table
@pytest.fixture(scope="module")
def parsed_table(spark):
    bodies = spark.createDataFrame(robots_txt_bodies())
    return {r["host"]: r.asDict()
            for r in robots_table_from_bodies(bodies).collect()}


def test_spark_table_reproduces_structured_fixture(parsed_table):
    expected = robots_rows()
    assert len(parsed_table) == len(expected)
    for _, want in expected.iterrows():
        got = parsed_table[want["host"]]
        assert list(got["disallow_prefixes"]) == list(want["disallow_prefixes"])
        assert got["max_per_wave"] == want["max_per_wave"]


def test_spark_table_sitemaps_on_variant_hosts(parsed_table):
    hosts = sorted(parsed_table)
    with_maps = [h for h in hosts if parsed_table[h]["sitemaps"]]
    assert with_maps  # variant h%3==2 hosts carry a sitemap line
    for h in with_maps:
        assert parsed_table[h]["sitemaps"] == [f"https://{h}/sitemap.xml"]


def test_simulator_twin_matches_spark_table(parsed_table):
    pdf = robots_txt_bodies()
    twin = robots_dict_from_bodies(dict(zip(pdf.host, pdf.body)))
    assert set(twin) == set(parsed_table)
    for h, want in twin.items():
        assert list(parsed_table[h]["disallow_prefixes"]) == want["disallow_prefixes"]
        assert parsed_table[h]["max_per_wave"] == want["max_per_wave"]


# ---------------------------------------------------- crawl integration
def test_crawl_with_parsed_robots_matches_simulator(spark):
    """End-to-end: both engines fed from the same raw robots bytes."""
    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.crawl.simulator import simulate
    from pink_spider_spark.sources.synth import (
        build_catalog_items, gen_pages_local, gen_pages_spark, seed_urls)
    from pink_spider_spark.sources.tables import TableStore

    items = build_catalog_items()
    n_pages, n_seeds, depth = 80, 5, 1
    pages_df = gen_pages_spark(spark, n_pages, items)
    bodies_pdf = robots_txt_bodies()
    robots_df = robots_table_from_bodies(spark.createDataFrame(bodies_pdf))

    root = tempfile.mkdtemp(prefix="robots_crawl_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=depth, max_waves=10))
        driver.run(seed_urls(n_seeds))
        spark_seen = {
            (r["url"], r["first_wave"], r["seq"])
            for r in store.table("seen").read(spark).collect()
        }

        pages_local = gen_pages_local(n_pages, items)
        sim = simulate(dict(zip(pages_local.url, pages_local.html)),
                       robots_dict_from_bodies(
                           dict(zip(bodies_pdf.host, bodies_pdf.body))),
                       items, seed_urls(n_seeds),
                       max_depth=depth, max_waves=10)
        assert spark_seen == set(sim.seen)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------- RFC 9309 full-rule matcher
from pink_spider_spark.crawl.robots import (  # noqa: E402
    rep_allowed,
    rep_match,
    rep_rules_from_bodies,
)


def test_parse_collects_ordered_rules_including_allow():
    r = parse_robots_txt(
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public*\n"
        "Allow:\n"          # empty Allow: no-op
        "Disallow:\n"       # empty Disallow: allow-all, dropped
        "Disallow: /tmp$\n")
    assert r["rules"] == [
        {"kind": "disallow", "pattern": "/private/"},
        {"kind": "allow", "pattern": "/private/public*"},
        {"kind": "disallow", "pattern": "/tmp$"},
    ]
    # the scheduler's prefix view is unchanged by the new field
    assert r["disallow_prefixes"] == ["/private/", "/tmp$"]


def test_rep_match_wildcards_and_anchor():
    assert rep_match("/p/*", "/p/123")
    assert rep_match("*session=*", "/p/1?session=xx")
    assert not rep_match("/q*", "/p/q")           # start-anchored
    assert rep_match("/a*b$", "/axbyb")           # needs the FINAL 'b'
    assert not rep_match("/a*b$", "/axbyc")
    assert rep_match("/fish$", "/fish")
    assert not rep_match("/fish$", "/fishing")    # RFC 9309 example
    assert rep_match("/fish*$", "/fishing")       # trailing * before $
    assert rep_match("/a*b*c$", "/a-b-b-c")       # greedy middles, last seg
    assert not rep_match("/a*b*c$", "/a-c-b")


def test_rep_allowed_longest_match_and_tie():
    rules = [("disallow", "/private/"), ("allow", "/private/*")]
    ok, kind, spec = rep_allowed(rules, "/private/44")
    assert (ok, kind, spec) == (True, "allow", 10)  # longer allow wins
    # exact length tie: allow wins per REP
    rules = [("disallow", "/dir/page"), ("allow", "/dir/page")]
    assert rep_allowed(rules, "/dir/page.html")[0] is True
    # no matching rule -> allowed, no winner
    assert rep_allowed([("disallow", "/x")], "/y") == (True, None, None)
    # anchored longest disallow beats shorter allow
    rules = [("allow", "/private/*"), ("disallow", "/private/*0$")]
    assert rep_allowed(rules, "/private/40")[0] is False
    assert rep_allowed(rules, "/private/44")[0] is True


def test_rep_decisions_matches_sequential_twin(spark):
    """Spark relational matcher vs the pure-Python twin, over every
    (rule-set, path) combination of the driver-gated fixture shapes plus
    LIKE-metachar traps ('_' and '%' in patterns and paths)."""
    rule_rows = [
        ("h.com", "disallow", "/private/"),
        ("h.com", "allow", "/private/*"),
        ("h.com", "disallow", "/private/*0$"),
        ("h.com", "disallow", "*session=*"),
        ("h.com", "disallow", "/p/1_3"),
        ("h.com", "disallow", "/q/1%3*"),
        ("i.net", "disallow", "/d*"),
        ("i.net", "allow", "/d1/*"),
        ("i.net", "disallow", "/exact$"),
    ]
    paths = ["/private/44", "/private/40", "/private/", "/priv",
             "/p/123", "/p/1_3", "/p/1_34", "/q/123", "/q/1%3x",
             "/p/9?session=xxx", "/d1/d1/p", "/d2/p", "/exact",
             "/exactly", "/", "/no-match"]
    urls = [(i * 100 + j, host, p)
            for i, host in enumerate(["h.com", "i.net", "z.org"])
            for j, p in enumerate(paths)]
    urls_df = spark.createDataFrame(urls, ["id", "host", "pathq"])
    rules_df = spark.createDataFrame(rule_rows, ["host", "kind", "pattern"])
    from pink_spider_spark.crawl.robots import rep_decisions
    got = {r["id"]: (r["allowed"], r["rep_kind"], r["rep_spec"])
           for r in rep_decisions(urls_df, rules_df).collect()}
    by_host = {}
    for host, kind, pattern in rule_rows:
        by_host.setdefault(host, []).append((kind, pattern))
    for uid, host, p in urls:
        want = rep_allowed(by_host.get(host, []), p)
        assert got[uid] == want, (uid, host, p, got[uid], want)


def test_rep_rules_from_bodies_long_form(spark):
    bodies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\nAllow: /x/pub*\n"),
         ("b.com", "User-agent: other\nDisallow: /all\n")],
        ["host", "body"])
    rows = sorted((r["host"], r["kind"], r["pattern"])
                  for r in rep_rules_from_bodies(bodies).collect())
    # b.com's group is for a foreign agent -> no rules for us
    assert rows == [("a.com", "allow", "/x/pub*"),
                    ("a.com", "disallow", "/x")]
