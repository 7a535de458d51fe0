"""Provider URL chain tests.

The identifier-extraction cases are ports of the reference's pinned unit
tests (reference: src/scraper.rs:504-528); the chain-order cases pin the
observable priority of the match chain (reference: src/scraper.rs:372-490).
"""

from pink_spider_spark import providers as P


def test_extract_identifier_soundcloud_track():
    src = ("https://w.soundcloud.com/player/?url=https%3A//api.soundcloud.com/"
           "tracks/195425494/stream&auto_play=false&hide_related=false&"
           "show_comments=true&show_user=true&show_reposts=false&visual=true")
    # the reference matches the raw (still percent-encoded) src here
    assert P.extract_identifier(src, P.SOUNDCLOUD_TRACK) == "195425494"


def test_extract_identifier_youtube_embed():
    assert P.extract_identifier(
        "https://www.youtube.com/embed/X8tOngmlES0?rel=0", P.YOUTUBE_EMBED
    ) == "X8tOngmlES0"


def test_extract_identifier_youtube_watch():
    assert P.extract_identifier(
        "https://www.youtube.com/watch?v=oDuif301F-8", P.YOUTUBE_WATCH
    ) == "oDuif301F-8"


def test_extract_identifier_youtube_list():
    assert P.extract_identifier(
        "https://www.youtube.com/embed/videoseries?list=PLy8LZ8FM-o0ViuGAF68RAaXkQ8V-3dbTX",
        P.YOUTUBE_LIST,
    ) == "PLy8LZ8FM-o0ViuGAF68RAaXkQ8V-3dbTX"


def test_chain_spotify_playlist_percent_encoded():
    # reference fixture/test.html:3 — embed.spotify.com?uri=<percent-encoded uri>
    url = ("https://embed.spotify.com/?uri=spotify%3Auser%3Aspincoaster"
           "%3Aplaylist%3A0OoyWSCQah4Jt28xnoJ0SJ")
    refs = P.extract_enclosures_from_url(url)
    assert len(refs) == 1
    r = refs[0]
    assert (r.kind, r.provider, r.identifier, r.owner_id) == (
        "playlist", "Spotify", "0OoyWSCQah4Jt28xnoJ0SJ", "spincoaster")


def test_chain_watch_beats_embed():
    # watch is checked before embed (scraper.rs:426-437)
    url = "https://www.youtube.com/watch?v=abc123"
    refs = P.extract_enclosures_from_url(url)
    assert refs[0].provider == "YouTube" and refs[0].identifier == "abc123"
    # unknown id -> fetch failure -> disabled track (scraper.rs:308-313)
    assert refs[0].state == "dead"


def test_chain_videoseries_hits_list_not_embed():
    url = "https://www.youtube.com/embed/videoseries?list=PL123"
    cat = P.Catalog({("YouTube", "playlist", "PL123"): {"child_identifiers": ["v1", "v2"]}})
    refs = P.extract_enclosures_from_url(url, cat)
    kinds = [(r.kind, r.identifier) for r in refs]
    assert kinds == [("playlist", "PL123"), ("track", "v1"), ("track", "v2")]


def test_chain_youtube_list_unknown_playlist_returns_empty_but_stops():
    url = "https://www.youtube.com/embed/videoseries?list=PLunknown"
    refs = P.extract_enclosures_from_url(url)
    assert refs == []


def test_am_song_fetch_failure_falls_through_to_youtube():
    # a URL that matches both the AM song pattern and a YT pattern can only
    # exist artificially, but fall-through semantics are pinned by the AM
    # branches: song-miss continues, album-miss stops (scraper.rs:375-394)
    url = "https://tools.applemusic.com/embed/v1/song/unknownsong"
    assert P.extract_enclosures_from_url(url) == []
    url2 = "https://tools.applemusic.com/embed/v1/album/unknownalbum"
    assert P.extract_enclosures_from_url(url2) == []


def test_am_album_link_with_song_param():
    cat = P.Catalog({("AppleMusic", "track", "909253"): {}})
    url = "https://itunes.apple.com/us/album/x/id12345?i=909253"
    refs = P.extract_enclosures_from_url(url, cat)
    assert [(r.kind, r.provider, r.identifier) for r in refs] == [
        ("track", "AppleMusic", "909253")]


def test_am_playlist_link():
    cat = P.Catalog({("AppleMusic", "playlist", "abcdef123"): {}})
    url = "https://itunes.apple.com/jp/playlist/my-mix/idpl.abcdef123"
    refs = P.extract_enclosures_from_url(url, cat)
    assert [(r.kind, r.identifier) for r in refs] == [("playlist", "abcdef123")]
    assert P.am_country(url) == "jp"


def test_soundcloud_playlist_expansion():
    cat = P.Catalog({
        ("SoundCloud", "playlist", "55"): {"child_identifiers": ["9", "8"]},
        ("SoundCloud", "track", "9"): {},
    })
    refs = P.extract_enclosures_from_url("https://api.soundcloud.com/playlists/55", cat)
    assert [(r.kind, r.identifier, r.state) for r in refs] == [
        ("playlist", "55", "alive"), ("track", "9", "alive"), ("track", "8", "dead")]


def test_soundcloud_user_tracks():
    cat = P.Catalog({("SoundCloud", "user", "u7"): {"child_identifiers": ["t1"]},
                     ("SoundCloud", "track", "t1"): {}})
    refs = P.extract_enclosures_from_url("https://api.soundcloud.com/users/u7", cat)
    assert [(r.kind, r.identifier) for r in refs] == [("track", "t1")]


def test_spotify_track_unknown_still_alive():
    # Spotify fetch failure -> Track::new (NOT disabled), scraper.rs:301-306
    refs = P.extract_enclosures_from_url("spotify:track:4uLU6hMCjMI75M1A2tKUQC")
    assert refs[0].state == "alive" and refs[0].provider == "Spotify"


def test_spotify_album_open():
    refs = P.extract_enclosures_from_url("https://open.spotify.com/album/6xkryXuiZU360Lngd4sx13")
    assert [(r.kind, r.identifier) for r in refs] == [("album", "6xkryXuiZU360Lngd4sx13")]


def test_provider_parse():
    assert P.parse_provider("youtube") == "YouTube"
    assert P.parse_provider("whatever") == "Raw"
