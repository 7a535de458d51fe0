"""Deterministic synthetic corpus: pages, provider catalog, robots, seeds.

Everything derives from ``(SEED, row index)`` — no wall clock, no global
RNG state — so generation is partition-parallelizable: the Spark path
(``gen_pages_spark``) produces byte-identical rows to the local path
(``gen_pages_local``) regardless of partitioning.  FIXTURES.md §1/§5/§6 is
the spec; the HTML recipes exercise every provider pattern family and the
readability corner cases (reference: fixture/test.html, src/readability.rs).

The golden ``text`` column is produced by running the row-at-a-time
extractor at generation time — the byte-identical-per-url invariant the
Spark UDF is judged against (BASELINE.json input_hint).
"""

from __future__ import annotations

import datetime
import random

import pandas as pd

from ..crawl.rss import _json
from ..extract import extract
from ..providers import Catalog

SEED = 42
N_HOSTS = 20
TLDS = ("com", "net", "org")

_WORDS = (
    "music discovery keeps shaping how listeners find brand new songs and "
    "artists every week across blogs playlists and radio shows while "
    "curators write long thoughtful reviews about melody rhythm production "
    "texture and the stories behind each record they love sharing"
).split()

_JA_SENTENCES = (
    "新しい音楽の発見は、毎週のように続いている。",
    "プレイリストの文化は、リスナーの習慣を変えた！",
    "レビューには、制作の背景や物語が書かれている。",
    "この曲のリズムとメロディは、本当に素晴らしい？",
)


# ------------------------------------------------------------------ catalog
def build_catalog_items(n_per_kind: int = 8) -> dict:
    """(provider, kind, identifier) -> catalog fields; playlists/users carry
    child track identifier lists (expansion, reference src/scraper.rs:322-370)."""
    items: dict = {}
    epoch = datetime.datetime(2024, 1, 1)

    def add(provider, kind, ident, k, children=(), title=None,
            search_term=None):
        # RAW provider-API-shaped fields: dates in each provider's wire
        # format (F11), Apple artwork as a {w}/{h} template (F9), YouTube
        # thumbnails as a partial variant map (F10).  The cooked catalog
        # (thumbnail_url/artwork_url/published_at) is DERIVED relationally
        # by functions.scalars.enrich_catalog, like the reference's
        # update_with_* functions (src/model/track.rs:395-460).
        dt = epoch + datetime.timedelta(hours=k)
        if provider == "SoundCloud":
            if k % 3 == 2:  # offset variant: same UTC instant
                raw_ts = (dt + datetime.timedelta(hours=9)).strftime(
                    "%Y/%m/%d %H:%M:%S") + " +0900"
            else:
                raw_ts = dt.strftime("%Y/%m/%d %H:%M:%S") + " +0000"
        elif provider == "Spotify":
            raw_ts = str(int(dt.replace(
                tzinfo=datetime.timezone.utc).timestamp()))
        else:  # YouTube / AppleMusic: RFC3339
            if k % 3 == 2:
                raw_ts = (dt + datetime.timedelta(hours=9)).strftime(
                    "%Y-%m-%dT%H:%M:%S") + "+09:00"
            else:
                raw_ts = dt.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
        if provider == "AppleMusic":
            template = (f"https://img.example/applemusic/{ident}/"
                        "{w}x{h}bb.jpg")
        else:
            template = f"https://img.example/{provider.lower()}/{ident}_640.jpg"
        yt_thumbnails = None
        if provider == "YouTube":
            yt_thumbnails = {"high": f"https://i.ytimg.example/{ident}/high.jpg"}
            for mod, key in ((2, "default"), (3, "medium"), (4, "maxres"),
                             (5, "standard")):
                if k % mod == 0:
                    yt_thumbnails[key] = f"https://i.ytimg.example/{ident}/{key}.jpg"
        items[(provider, kind, ident)] = {
            "provider": provider,
            "kind": kind,
            "identifier": ident,
            "title": title or f"{provider} {kind} {k}",
            "owner_id": f"owner_{provider.lower()}_{k % 4}",
            "owner_name": f"Owner {provider} {k % 4}",
            "url": f"https://{provider.lower()}.example/{kind}/{ident}",
            # NOTE: dict insertion order MUST match
            # PROVIDER_CATALOG_RAW_SCHEMA (createDataFrame(pandas, schema)
            # maps by position)
            "search_term": search_term,
            "published_at_raw": raw_ts,
            "artwork_template": template,
            "yt_thumbnails": yt_thumbnails,
            "audio_url": None,
            "duration": 120 + (k * 17) % 300,
            "state": "alive",
            "child_identifiers": list(children),
        }

    for k in range(n_per_kind):
        add("YouTube", "track", f"ytt{k}", k)
        add("SoundCloud", "track", f"sct{k}", k)
        add("Spotify", "track", f"spt{k}", k)
        add("AppleMusic", "track", f"amt{k}", k)
    for k in range(max(2, n_per_kind // 2)):
        yt_children = [f"ytt{(k + j) % n_per_kind}" for j in range(3)]
        sc_children = [f"sct{(k + j) % n_per_kind}" for j in range(2)] + [f"scx{k}"]
        sp_children = [f"spt{(k + j) % n_per_kind}" for j in range(3)]
        add("YouTube", "playlist", f"ytp{k}", k, yt_children)
        add("SoundCloud", "playlist", f"scp{k}", k, sc_children)
        add("Spotify", "playlist", f"spp{k}", k, sp_children)
        add("AppleMusic", "playlist", f"amp{k}", k)
        add("SoundCloud", "user", f"scu{k}", k, [f"sct{k % n_per_kind}"])
        add("Spotify", "album", f"spa{k}", k)
        add("AppleMusic", "album", f"ama{k}", k)
    # Apple Music artist SEARCH fixture (reference: update_artists.rs:47-69
    # search_artists by artist name).  search_term = the lowercased query
    # that returns the row.  Owner names are "Owner AppleMusic {0..3}":
    # - owner 1: exactly ONE result whose name does NOT match -> taken
    #   anyway (items.len()==1 branch, update_artists.rs:52-55)
    # - owner 2: two results, one exact case-insensitive name match ->
    #   the filter branch picks it (update_artists.rs:57-63)
    # - owner 3: two results, no exact match -> "Not updated"
    # - owner 0: no results -> unchanged
    add("AppleMusic", "artist", "amar1", 101, title="Owner Applemusic Uno",
        search_term="owner applemusic 1")
    add("AppleMusic", "artist", "amar2", 102, title="Owner AppleMusic 2",
        search_term="owner applemusic 2")
    add("AppleMusic", "artist", "amar2x", 103,
        title="Owner AppleMusic 2 Tribute", search_term="owner applemusic 2")
    add("AppleMusic", "artist", "amar3a", 104, title="Owner AppleMusic Trio",
        search_term="owner applemusic 3")
    add("AppleMusic", "artist", "amar3b", 105, title="Owner AM Three",
        search_term="owner applemusic 3")
    return items


def catalog_rows(items: dict | None = None) -> pd.DataFrame:
    items = items or build_catalog_items()
    return pd.DataFrame(list(items.values()))


def catalog_df(spark, items: dict | None = None):
    """RAW catalog rows -> enriched (cooked) catalog DataFrame via the
    F9/F10/F11 scalar functions (functions/scalars.py)."""
    from ..functions.scalars import enrich_catalog
    from .schemas import PROVIDER_CATALOG_RAW_SCHEMA

    pdf = catalog_rows(items)
    # createDataFrame(pandas, schema) maps BY POSITION: guard the order
    assert list(pdf.columns) == [f.name for f in
                                 PROVIDER_CATALOG_RAW_SCHEMA.fields], \
        "catalog dict order must match PROVIDER_CATALOG_RAW_SCHEMA"
    raw = spark.createDataFrame(pdf, schema=PROVIDER_CATALOG_RAW_SCHEMA)
    return enrich_catalog(raw)


# ----------------------------------------------------------------- embeds
def _embed_pool(items: dict) -> list:
    """(html snippet template keyed on identifier) for every pattern family
    plus known-missing identifiers (dead/fall-through paths)."""
    pool = []
    for (provider, kind, ident) in items:
        if provider == "YouTube" and kind == "track":
            pool.append(f'<iframe src="https://www.youtube.com/embed/{ident}"></iframe>')
            pool.append(f'<a href="https://www.youtube.com/watch?v={ident}">watch</a>')
        elif provider == "YouTube" and kind == "playlist":
            pool.append(f'<iframe src="https://www.youtube.com/embed/videoseries?list={ident}"></iframe>')
        elif provider == "SoundCloud" and kind == "track":
            pool.append(
                f'<iframe src="https://w.soundcloud.com/player/?url='
                f'https%3A//api.soundcloud.com/tracks/{ident}&auto_play=false"></iframe>')
        elif provider == "SoundCloud" and kind == "playlist":
            pool.append(
                f'<iframe data-src="https://w.soundcloud.com/player/?url='
                f'https%3A//api.soundcloud.com/playlists/{ident}"></iframe>')
        elif provider == "SoundCloud" and kind == "user":
            pool.append(
                f'<a href="https://w.soundcloud.com/player/?url='
                f'https%3A//api.soundcloud.com/users/{ident}">user</a>')
        elif provider == "Spotify" and kind == "track":
            pool.append(f'<iframe src="https://open.spotify.com/embed/track/{ident}"></iframe>')
            pool.append(f'<a href="spotify:track:{ident}">uri</a>')
        elif provider == "Spotify" and kind == "playlist":
            owner = items[(provider, kind, ident)]["owner_id"]
            pool.append(
                f'<iframe src="https://embed.spotify.com/?uri='
                f'spotify%3Auser%3A{owner}%3Aplaylist%3A{ident}"></iframe>')
        elif provider == "Spotify" and kind == "album":
            pool.append(f'<a href="https://open.spotify.com/album/{ident}">album</a>')
        elif provider == "AppleMusic" and kind == "track":
            pool.append(f'<iframe src="https://tools.applemusic.com/embed/v1/song/{ident}?country=us"></iframe>')
        elif provider == "AppleMusic" and kind == "album":
            pool.append(f'<a href="https://itunes.apple.com/us/album/some-name/id{ident}">am album</a>')
        elif provider == "AppleMusic" and kind == "playlist":
            pool.append(f'<iframe src="https://tools.applemusic.com/embed/v1/playlist/pl.{ident}"></iframe>')
    # identifiers absent from the catalog: exercise dead-track / stop /
    # fall-through paths (reference: src/scraper.rs:308-320,375-425)
    pool.append('<iframe src="https://www.youtube.com/embed/ytmissing0"></iframe>')
    pool.append('<iframe src="https://w.soundcloud.com/player/?url=https%3A//api.soundcloud.com/tracks/scmissing0"></iframe>')
    pool.append('<a href="spotify:track:spmissing0">uri</a>')
    pool.append('<iframe src="https://tools.applemusic.com/embed/v1/album/ammissing0"></iframe>')
    return sorted(pool)


# ------------------------------------------------------------------ pages
def host_of(i: int, n_hosts: int = N_HOSTS) -> int:
    """Heavy-host skew: host 0 receives ~30% of pages (FIXTURES.md §1)."""
    return 0 if i % 10 < 3 else 1 + (i % (n_hosts - 1))


def host_name(h: int) -> str:
    return f"host{h}.example.{TLDS[h % len(TLDS)]}"


def page_url(i: int, n_hosts: int = N_HOSTS) -> str:
    return f"https://{host_name(host_of(i, n_hosts))}/p/{i}"


def _paragraph(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    mid = len(words) // 2
    words[mid] += ","
    return " ".join(words) + rng.choice([".", "!", "?", "."])


def page_html(i: int, n_pages: int, items: dict, pool: list,
              n_hosts: int = N_HOSTS, weight: int = 1) -> str:
    """Deterministic page body for index i (recipes: FIXTURES.md §5).
    ``weight`` scales paragraph count to emulate realistic page sizes in
    throughput benchmarks (extraction-CPU-bound, like real 50-100 KB pages)."""
    rng = random.Random(f"page-{SEED}-{i}")
    lang = ("en", "ja", "de", "fr")[i % 4]
    url = page_url(i, n_hosts)

    # article paragraphs
    paras = []
    for _ in range((2 + rng.randrange(4)) * weight):
        paras.append(f"<p>{_paragraph(rng, 14 + rng.randrange(25))}</p>")
    if lang == "ja":
        paras.append(f"<p>{''.join(rng.sample(_JA_SENTENCES, 2))}</p>")

    # embeds: 0..3, duplicates possible (first-seen dedup exercise)
    embeds = []
    n_embeds = rng.randrange(4)
    for _ in range(n_embeds):
        embeds.append(rng.choice(pool))
    if n_embeds and rng.random() < 0.25:
        embeds.append(embeds[0])  # deliberate duplicate

    # discovered links: 3 intra-site + occasional disallowed/dead
    link_targets = [(i * 7 + 1) % n_pages, (i * 13 + 5) % n_pages, (i * 31 + 11) % n_pages]
    links = [f'<a href="{page_url(j, n_hosts)}">more {j}</a>' for j in link_targets]
    if i % 11 == 0:
        links.append(f'<a href="https://{host_name(host_of(i, n_hosts))}/private/{i}">private</a>')
    if i % 13 == 0:
        links.append(f'<a href="https://{host_name(host_of(i, n_hosts))}/p/{n_pages + i}">dead</a>')

    body_bits = []
    body_bits.append(f'<div id="main" class="article">')
    for k, p in enumerate(paras):
        body_bits.append(p)
        if k < len(embeds):
            body_bits.append(embeds[k])
    for e in embeds[len(paras):]:
        body_bits.append(e)
    if rng.random() < 0.3:
        body_bits.append("<br><br>Loose trailing commentary worth wrapping in a paragraph, truly.")
    if rng.random() < 0.5:
        body_bits.append(f'<img src="https://cdn.example.com/img/{i}.png">')
    body_bits.append("</div>")

    # distractors (preprocess/clean exercise)
    body_bits.append(f'<div class="sidebar"><p>{_paragraph(rng, 22)}</p></div>')
    body_bits.append('<div class="nav-links">' + "".join(links) + "</div>")
    if rng.random() < 0.25:
        body_bits.append('<form><input name="q"><input type="submit"></form>')
    body_bits.append("<footer>generated corpus footer</footer>")

    og = [
        f'<meta property="og:title" content="Synth Page {i}">',
        f'<meta property="og:locale" content="{lang}">',
    ]
    if rng.random() < 0.8:
        og.append(f'<meta property="og:description" content="Synthetic page {i} about music.">')
    if rng.random() < 0.6:
        og.append(f'<meta property="og:image" content="https://img.example.com/og/{i}.jpg">')

    return (
        "<html><head><title>Synth Page "
        + str(i)
        + "</title>"
        + "".join(og)
        + "</head><body>"
        + "".join(body_bits)
        + "</body></html>"
    )


def page_record(i: int, n_pages: int, items: dict, pool: list,
                catalog: Catalog, n_hosts: int = N_HOSTS, weight: int = 1) -> dict:
    url = page_url(i, n_hosts)
    html = page_html(i, n_pages, items, pool, n_hosts, weight)
    golden = extract(html, url, catalog)
    return {
        "url": url,
        "warc_ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": golden.text,
        "lang": ("en", "ja", "de", "fr")[i % 4],
    }


def gen_pages_local(n_pages: int, items: dict | None = None,
                    n_hosts: int = N_HOSTS, weight: int = 1) -> pd.DataFrame:
    items = items or build_catalog_items()
    pool = _embed_pool(items)
    catalog = Catalog(items)
    return pd.DataFrame([page_record(i, n_pages, items, pool, catalog, n_hosts, weight)
                         for i in range(n_pages)])


def gen_pages_spark(spark, n_pages: int, items: dict | None = None,
                    n_hosts: int = N_HOSTS, partitions: int | None = None,
                    weight: int = 1):
    """Distributed generation: spark.range -> mapInPandas, rows a pure
    function of the index (same bytes as gen_pages_local)."""
    from ..functions.udfs import ensure_package_shipped
    from ..sources.schemas import PAGES_SCHEMA

    ensure_package_shipped(spark)
    items = items or build_catalog_items()
    pool = _embed_pool(items)
    sc = spark.sparkContext
    b_items = sc.broadcast(items)
    b_pool = sc.broadcast(pool)

    def gen(batches):
        cat = Catalog(b_items.value)
        for pdf in batches:
            rows = [page_record(int(i), n_pages, b_items.value, b_pool.value,
                                cat, n_hosts, weight)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


# ------------------------------------------------------------------ feeds
def feeds_rows(n_feeds: int = 10) -> pd.DataFrame:
    """RSS feed sources (reference: db/migrate/019_create_feeds.rb,
    struct src/model/feed.rs:27-45).  velocity>0 marks 'active' feeds
    (reference: src/main.rs:52-59); timestamps derive from the index."""
    epoch = datetime.datetime(2024, 1, 1)
    rows = []
    for f in range(n_feeds):
        rows.append({
            "url": f"https://feeds.example.com/rss/{f}.xml",
            "title": f"Feed {f}",
            "description": f"Synthetic feed {f}",
            "language": ("en", "ja", "de", "fr")[f % 4],
            "velocity": float(f % 3),  # 0 -> inactive
            "website": f"https://{host_name(f % N_HOSTS)}/",
            "state": "alive" if f % 7 else "dead",
            "last_updated": epoch + datetime.timedelta(hours=f),
            "crawled": epoch,
        })
    return pd.DataFrame(rows)


def feed_entries_rows(n_feeds: int = 10, entries_per_feed: int = 12,
                      n_pages: int = 300, n_hosts: int = N_HOSTS) -> pd.DataFrame:
    """RSS entries per feed (FIXTURES.md §8) — stand-in for the network
    fetch+parse (reference: src/rss.rs:24-43).  Exercises:
    - null/empty alternate links (skip path, src/model/feed.rs:214-217)
    - published < epoch+1000s (validity predicate, src/model/entry.rs:291-293)
    - empty origin ids (fallback to url, src/model/entry.rs:324-328)
    - titles needing trim (src/model/entry.rs:311-313)
    """
    epoch = datetime.datetime(2024, 1, 1)
    rows = []
    for f in range(n_feeds):
        for e in range(entries_per_feed):
            i = (f * 37 + e * 11) % n_pages  # target page index
            k = f * entries_per_feed + e
            alternate = page_url(i, n_hosts)
            if k % 9 == 4:
                alternate = None  # skip path
            elif k % 9 == 7:
                alternate = ""    # skip path (empty)
            published = (datetime.datetime(1970, 1, 1)  # invalid (ts < 1000)
                         if k % 8 == 5 else epoch + datetime.timedelta(minutes=k))
            keywords = [] if k % 4 == 2 else ["music", f"tag{k % 5}"]
            enclosure = ([{"href": f"https://media.example.com/ep{k}.mp3",
                           "type": "audio/mpeg", "length": 1000 + k * 331}]
                         if k % 3 == 0 else [])
            rows.append({
                "feed_url": f"https://feeds.example.com/rss/{f}.xml",
                "origin_id": "" if k % 6 == 3 else f"urn:entry:{f}:{e}",
                "title": f"  Entry {f}-{e}  ",  # trim exercise
                "summary": f"Summary of entry {f}-{e}.",
                "content": f"<p>Feed content {f}-{e}</p>",
                "author": f"author{f % 4}",
                "published": published,
                "updated": epoch + datetime.timedelta(minutes=k, seconds=30),
                "alternate_href": alternate,
                # jsonb columns (db/migrate/020:9-11), canonical JSON
                "alternate": _json([{"href": alternate}] if alternate else []),
                "keywords": _json(keywords),
                "enclosure": _json(enclosure),
                "pos": e,
            })
    return pd.DataFrame(rows)


# ------------------------------------------------------------------ robots
def robots_rows(n_hosts: int = N_HOSTS) -> pd.DataFrame:
    """Per-host politeness rules (north-rule addition; FIXTURES.md §4).
    crawl_delay default mirrors the reference's 500 ms sleep
    (reference: src/update_tracks.rs:18).  The heavy host gets a larger
    per-wave budget so skew handling is observable."""
    rows = []
    for h in range(n_hosts):
        rows.append({
            "host": host_name(h),
            "disallow_prefixes": ["/private"],
            "crawl_delay_ms": 500 if h else 250,
            "max_per_wave": 64 if h == 0 else 16,
        })
    return pd.DataFrame(rows)


def robots_txt_bodies(n_hosts: int = N_HOSTS) -> pd.DataFrame:
    """Raw robots.txt bytes per host whose parse reproduces robots_rows
    EXACTLY (the raw-bytes stand-in for fetching https://host/robots.txt).
    Budgets ride on Crawl-delay: delay = WAVE_SECONDS / max_per_wave.
    Three layout variants exercise RFC 9309 group selection: plain ``*``
    group; a decoy ``*`` + foreign-bot group overridden by a specific
    ``pink-spider`` group; stacked User-agent lines + comments + empty
    Disallow + Sitemap."""
    from ..crawl.robots import WAVE_SECONDS

    rows = []
    for h in range(n_hosts):
        budget = 64 if h == 0 else 16
        delay = WAVE_SECONDS / budget
        if h % 3 == 1:
            body = (
                "User-agent: *\n"
                "Disallow: /decoy\n"
                "Crawl-delay: 30\n"
                "\n"
                "User-agent: megabot\n"
                "Disallow: /\n"
                "\n"
                "User-agent: pink-spider\n"
                "Disallow: /private\n"
                f"Crawl-delay: {delay}\n"
            )
        elif h % 3 == 2:
            body = (
                "# politeness rules\n"
                "User-agent: foobot\n"
                "User-agent: *\n"
                "Disallow: /private  # members only\n"
                "Disallow:\n"
                f"Crawl-delay: {delay}\n"
                f"Sitemap: https://{host_name(h)}/sitemap.xml\n"
            )
        else:
            body = (
                "User-agent: *\n"
                "Disallow: /private\n"
                f"Crawl-delay: {delay}\n"
            )
        rows.append({"host": host_name(h), "body": body.encode("utf-8")})
    return pd.DataFrame(rows)


def sitemap_xml_bodies(n_pages: int = 120, n_hosts: int = N_HOSTS) -> pd.DataFrame:
    """Deterministic sitemap corpus ``(url, host, body)``: every host
    advertises ``/sitemap.xml`` listing its pages; the heavy host 0 uses
    a ``<sitemapindex>`` over two leaf sitemaps (odd/even pages) to
    exercise index resolution.  lastmod derives from the page index (no
    wall clock)."""
    by_host: dict = {}
    for i in range(n_pages):
        by_host.setdefault(host_of(i, n_hosts), []).append(i)

    def urlset(ids):
        items = "".join(
            f"<url><loc>{page_url(i, n_hosts)}</loc>"
            f"<lastmod>2024-01-{1 + i % 28:02d}</lastmod></url>"
            for i in ids)
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"{items}</urlset>")

    rows = []
    for h, ids in sorted(by_host.items()):
        host = host_name(h)
        if h == 0:
            leaves = [f"https://{host}/sitemap-0.xml",
                      f"https://{host}/sitemap-1.xml"]
            index = ('<?xml version="1.0" encoding="UTF-8"?>'
                     '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                     + "".join(f"<sitemap><loc>{u}</loc></sitemap>"
                               for u in leaves)
                     + "</sitemapindex>")
            rows.append({"url": f"https://{host}/sitemap.xml", "host": host,
                         "body": index.encode("utf-8")})
            for k, leaf in enumerate(leaves):
                rows.append({"url": leaf, "host": host,
                             "body": urlset([i for i in ids
                                             if i % 2 == k]).encode("utf-8")})
        else:
            rows.append({"url": f"https://{host}/sitemap.xml", "host": host,
                         "body": urlset(ids).encode("utf-8")})
    return pd.DataFrame(rows)


def seed_urls(n_seeds: int, n_hosts: int = N_HOSTS) -> list:
    """Deterministic seed list: page indices 0..n_seeds-1."""
    return [page_url(i, n_hosts) for i in range(n_seeds)]


def feed_xml_rows(n_feeds: int = 10, entries_per_feed: int = 12,
                  n_pages: int = 300, n_hosts: int = N_HOSTS) -> pd.DataFrame:
    """Raw RSS 2.0 XML per feed whose parse reproduces feed_entries_rows
    EXACTLY — the raw-bytes stand-in for rss::fetch (reference:
    src/rss.rs:24-43).  Every 5th-ish feed is ISO-8859-1 encoded with the
    matching charset header to exercise the reference's fallback decode
    path (src/rss.rs:33-40); null alternate -> no <link>, empty -> empty
    <link/> (skip paths src/model/feed.rs:214-217)."""
    import email.utils
    from xml.sax.saxutils import escape

    fe = feed_entries_rows(n_feeds, entries_per_feed, n_pages, n_hosts)
    feeds = feeds_rows(n_feeds)
    rows = []
    for fi, (_, feed) in enumerate(feeds.iterrows()):
        sub = fe[fe.feed_url == feed.url].sort_values("pos")
        items = []
        for _, e in sub.iterrows():
            parts = ["<item>"]
            parts.append(f"<guid>{escape(e.origin_id)}</guid>")
            parts.append(f"<title>{escape(e.title)}</title>")
            parts.append(f"<description>{escape(e.summary)}</description>")
            parts.append(
                f"<content:encoded>{escape(e.content)}</content:encoded>")
            parts.append(f"<author>{escape(e.author)}</author>")
            pub = email.utils.format_datetime(
                e.published.to_pydatetime().replace(
                    tzinfo=datetime.timezone.utc))
            parts.append(f"<pubDate>{pub}</pubDate>")
            upd = e.updated.to_pydatetime().strftime("%Y-%m-%dT%H:%M:%SZ")
            parts.append(f"<atom:updated>{upd}</atom:updated>")
            import json as _jsonlib
            for kw in _jsonlib.loads(e.keywords):
                parts.append(f"<category>{escape(kw)}</category>")
            for enc in _jsonlib.loads(e.enclosure):
                parts.append(
                    f'<enclosure url="{escape(enc["href"])}" '
                    f'type="{enc["type"]}" length="{enc["length"]}"/>')
            if e.alternate_href is None:
                pass  # no <link>: the skip path
            elif e.alternate_href == "":
                parts.append("<link></link>")
            else:
                parts.append(f"<link>{escape(e.alternate_href)}</link>")
            parts.append("</item>")
            items.append("".join(parts))
        charset = "iso-8859-1" if fi % 5 == 3 else None
        xml = (
            f'<?xml version="1.0" encoding="{charset or "UTF-8"}"?>'
            '<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom" '
            'xmlns:content="http://purl.org/rss/1.0/modules/content/">'
            f"<channel><title>{escape(feed.title)}</title>"
            f"<description>{escape(feed.description)}</description>"
            f"<language>{feed.language}</language>"
            f"<link>{escape(feed.website)}</link>"
            + "".join(items) + "</channel></rss>")
        data = xml.encode(charset or "utf-8")
        rows.append({"feed_url": feed.url, "xml": data, "charset": charset})
    return pd.DataFrame(rows)
