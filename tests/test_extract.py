"""Extraction pipeline tests.

``test_scrape_reference_fixture`` ports the reference's pinned end-to-end
test over its HTML fixture (reference: src/scraper.rs:529-541 over
fixture/test.html — a page embedding one percent-encoded Spotify playlist
iframe); the rest pin readability behaviours the corpus exercises
(reference: src/readability.rs).
"""

from pink_spider_spark.extract import extract
from pink_spider_spark.providers import Catalog

# content mirrors reference fixture/test.html:1-5
REFERENCE_FIXTURE = """<html>
  <body>
    <iframe src="https://embed.spotify.com/?uri=spotify%3Auser%3Aspincoaster%3Aplaylist%3A0OoyWSCQah4Jt28xnoJ0SJ"></iframe>
  </body>
</html>"""

CAT = Catalog({
    ("Spotify", "playlist", "0OoyWSCQah4Jt28xnoJ0SJ"):
        {"child_identifiers": ["sp1", "sp2", "sp3"]},
})


def test_scrape_reference_fixture():
    product = extract(REFERENCE_FIXTURE, "http://example.com/", CAT)
    # assert_eq!(playlists.len(), 1)
    assert len(product.playlists) == 1
    # spotify tracks at top level == 0 (nested only)
    sp_tracks = [t for t in product.tracks if t["provider"] == "Spotify"]
    assert len(sp_tracks) == 0
    # spotify_playlists[0].tracks.len() > 0
    assert len(product.playlists[0]["nested_track_identifiers"]) > 0
    # page has no scoreable text: text is empty
    assert product.text == ""


def test_text_is_trimmed_concatenation():
    html = """<html><body><div id="main">
      <p>First paragraph, long enough to be a candidate. It keeps going!</p>
      <p>Second paragraph, also long enough to matter, yes indeed.</p>
    </div></body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert product.text == (
        "First paragraph, long enough to be a candidate. It keeps going!"
        "Second paragraph, also long enough to matter, yes indeed."
    )


def test_unlikely_candidates_dropped_in_preprocess():
    html = """<html><body>
      <div id="main"><p>Real article text that is long enough to score, truly.</p></div>
      <div class="sidebar"><p>Sidebar junk that is also long enough to score.</p></div>
    </body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert "Sidebar junk" not in product.text
    assert "Real article text" in product.text


def test_likely_overrides_unlikely():
    # class matches UNLIKELY(sidebar) AND LIKELY(article) -> kept
    html = """<html><body>
      <div class="sidebar-article"><p>Body copy long enough to be scored properly, ok.</p></div>
    </body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert "Body copy" in product.text


def test_script_and_style_removed():
    html = """<html><head><script>var x = 1;</script><style>p{}</style></head>
    <body><p>Visible paragraph content that is over twenty chars.</p></body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert "var x" not in product.text
    assert "Visible paragraph" in product.text


def test_br_br_wraps_paragraph():
    html = ("<html><body><div>"
            "<p>Intro paragraph that is long enough to score as candidate.</p>"
            "<br><br>Loose text that follows a double break and is long."
            "</div></body></html>")
    product = extract(html, "https://host0.example.com/")
    assert "Loose text that follows" in product.text


def test_og_metadata_collected():
    html = """<html><head>
      <meta property="og:title" content="Page Title">
      <meta name="og:description" content="Desc here">
      <meta property="og:image" content="https://img.example.com/1.jpg">
      <meta property="og:locale" content="en_US">
      <meta property="not-og" content="ignored">
    </head><body><p>Body text long enough for a candidate to be made.</p></body></html>"""
    product = extract(html, "https://host0.example.com/")
    og = product.og
    assert og["title"] == "Page Title"
    assert og["description"] == "Desc here"
    assert og["locale"] == "en_US"
    assert og["images"] == ["https://img.example.com/1.jpg"]


def test_link_farm_pruned_by_link_density():
    html = """<html><body><div id="page">
      <div><p>Genuine article body text, long and punctuated. More text here, fine!</p>
      <p>Another real paragraph with sentences. It talks, it sings, it dances!</p></div>
      <div><a href="/x1">link one text here</a><a href="/x2">link two text here</a>
      <a href="/x3">link three text here</a></div>
    </div></body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert "Genuine article" in product.text
    assert "link one text" not in product.text


def test_links_harvested_absolute():
    html = """<html><body>
      <a href="/relative/page">rel</a>
      <a href="https://other.example.org/abs">abs</a>
      <p>Some body text to keep the page non-trivial, ok then.</p>
    </body></html>"""
    product = extract(html, "https://host3.example.com/dir/index.html")
    assert "https://host3.example.com/relative/page" in product.links
    assert "https://other.example.org/abs" in product.links


def test_enclosure_first_seen_dedup():
    html = """<html><body>
      <iframe src="https://www.youtube.com/embed/dupvid1"></iframe>
      <iframe src="https://www.youtube.com/embed/dupvid1"></iframe>
      <iframe src="https://www.youtube.com/watch?v=dupvid1"></iframe>
    </body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert len(product.tracks) == 1
    assert product.tracks[0]["identifier"] == "dupvid1"


def test_h1_header_footer_removed_from_content():
    html = """<html><body><div id="art">
      <h1>Headline</h1>
      <p>Primary paragraph of the article, long enough to matter here.</p>
      <footer>footer junk</footer>
    </div></body></html>"""
    product = extract(html, "https://host0.example.com/")
    assert "Headline" not in product.text
    assert "footer junk" not in product.text
    assert "Primary paragraph" in product.text
