"""Provider URL pattern matching — the music-embed detection chain.

Re-expresses the reference's enclosure-URL classification
(reference: src/scraper.rs:372-490 ``extract_enclosures_from_url``) as a pure
Python function over a URL string.  The regex constants are the reference's
verbatim (public) patterns:

- YouTube   EMBED/LIST/WATCH            reference: src/youtube.rs:18-20
- SoundCloud TRACK/PLAYLIST/USER        reference: src/soundcloud.rs:9-11
- Spotify   track/playlist/album x uri/open/embed
                                        reference: src/spotify.rs:23-31
- AppleMusic tools-embed song/album/playlist + itunes album/playlist links
                                        reference: src/apple_music.rs:20-25

Semantics preserved exactly:

- ``extract_identifier`` returns capture group 1 split at the first ``?``
  (reference: src/scraper.rs:273-284).
- The URL is percent-decoded (lossy UTF-8) before matching
  (reference: src/scraper.rs:373).
- The match chain is ORDERED and the order is observable: an Apple Music song
  fetch failure falls through to the next pattern, while AM album/playlist
  fetch failures return an empty result but still STOP the chain
  (reference: src/scraper.rs:375-425).
- "fetch success" is membership in the deterministic provider catalog (a
  broadcastable fixture standing in for the live provider REST APIs).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, unquote, urlsplit

# --- verbatim pattern constants (reference file:line cited above) ---
YOUTUBE_EMBED = r"www.youtube.com/embed/([a-zA-Z0-9_-].+)"
YOUTUBE_LIST = r"www.youtube.com/embed/videoseries\?list=([a-zA-Z0-9_-]+)"
YOUTUBE_WATCH = r"www.youtube.com/watch\?v=([a-zA-Z0-9_-]+)"

SOUNDCLOUD_TRACK = r"api.soundcloud.com/tracks/([a-zA-Z0-9_-]+)"
SOUNDCLOUD_PLAYLIST = r"api.soundcloud.com/playlists/([a-zA-Z0-9_-]+)"
SOUNDCLOUD_USER = r"api.soundcloud.com/users/([a-zA-Z0-9_-]+)"

SPOTIFY_TRACK_URI = r"spotify:track:([a-zA-Z0-9_-]+)"
SPOTIFY_TRACK_OPEN = r"open.spotify.com/track/([a-zA-Z0-9_-]+)"
SPOTIFY_TRACK_EMBED = r"open.spotify.com/embed/track/([a-zA-Z0-9_-]+)"
SPOTIFY_PLAYLIST_URI = r"(spotify:user:([a-zA-Z0-9_-]+):playlist:([a-zA-Z0-9_-]+))"
SPOTIFY_PLAYLIST_OPEN = r"(open.spotify.com/user/([a-zA-Z0-9_-]+)/playlist/([a-zA-Z0-9_-]+))"
SPOTIFY_PLAYLIST_EMBED = r"(open.spotify.com/embed/user/([a-zA-Z0-9_-]+)/playlist/([a-zA-Z0-9_-]+))"
SPOTIFY_ALBUM_URI = r"spotify:album:([a-zA-Z0-9_-]+)"
SPOTIFY_ALBUM_OPEN = r"open.spotify.com/album/([a-zA-Z0-9_-]+)"
SPOTIFY_ALBUM_EMBED = r"open.spotify.com/embed/album/([a-zA-Z0-9_-]+)"

AM_ALBUM_LINK = r"itunes.apple.com/([a-zA-Z0-9_-]+)/album/([a-zA-Z0-9_-]+)/id([a-zA-Z0-9_-]+)"
AM_PLAYLIST_LINK = r"itunes.apple.com/([a-zA-Z0-9_-]+)/playlist/([^/]+)/idpl.([a-zA-Z0-9_-]+)"
AM_SONG_URL = r"tools.applemusic.com/embed/v1/song/([a-zA-Z0-9_-]+)"
AM_ALBUM_URL = r"tools.applemusic.com/embed/v1/album/([a-zA-Z0-9_-]+)"
AM_PLAYLIST_URL = r"tools.applemusic.com/embed/v1/playlist/pl.([a-zA-Z0-9_-]+)"

PROVIDER_APPLE = "AppleMusic"
PROVIDER_YOUTUBE = "YouTube"
PROVIDER_SOUNDCLOUD = "SoundCloud"
PROVIDER_SPOTIFY = "Spotify"
PROVIDER_CUSTOM = "Custom"
PROVIDER_RAW = "Raw"

STATE_ALIVE = "alive"
STATE_DEAD = "dead"

_COMPILED: dict[str, re.Pattern] = {}


def _re(pattern: str) -> re.Pattern:
    pat = _COMPILED.get(pattern)
    if pat is None:
        pat = _COMPILED[pattern] = re.compile(pattern)
    return pat


def parse_provider(s: str) -> str:
    """Case-tolerant provider parse, unknown -> Raw (reference: src/model/provider.rs:37-50)."""
    return {
        "AppleMusic": PROVIDER_APPLE, "applemusic": PROVIDER_APPLE,
        "YouTube": PROVIDER_YOUTUBE, "youtube": PROVIDER_YOUTUBE,
        "SoundCloud": PROVIDER_SOUNDCLOUD, "soundcloud": PROVIDER_SOUNDCLOUD,
        "Spotify": PROVIDER_SPOTIFY, "spotify": PROVIDER_SPOTIFY,
        "Custom": PROVIDER_CUSTOM,
    }.get(s, PROVIDER_RAW)


def extract_identifier(value: str, pattern: str) -> str | None:
    """First capture group of the leftmost match, split at '?'
    (reference: src/scraper.rs:273-284)."""
    m = _re(pattern).search(value)
    if m is None:
        return None
    return m.group(1).split("?")[0]


def url_param(url_str: str, key: str) -> str | None:
    """Query parameter lookup with https:// prefixing
    (reference: src/apple_music.rs:319-340)."""
    if not url_str.startswith("http"):
        url_str = "https://" + url_str
    try:
        q = urlsplit(url_str).query
    except ValueError:
        return None
    vals = parse_qs(q).get(key)
    return vals[0] if vals else None


def parse_am_url(value: str, pattern: str):
    """(country, name, id, optional song id from ?i=)
    (reference: src/apple_music.rs:362-375)."""
    m = _re(pattern).search(value)
    if m is None:
        return None
    return (m.group(1), m.group(2), m.group(3), url_param(value, "i"))


def am_country(url: str) -> str:
    """Country resolution chain (reference: src/apple_music.rs:342-352)."""
    c = url_param(url, "country")
    if c is not None:
        return c
    p = parse_am_url(url, AM_PLAYLIST_LINK)
    if p is not None:
        return p[0]
    a = parse_am_url(url, AM_ALBUM_LINK)
    if a is not None:
        return a[0]
    return "us"


def parse_spotify_playlist(value: str, pattern: str):
    """(user_id, playlist_id) from capture groups 2,3
    (reference: src/spotify.rs:210-232)."""
    m = _re(pattern).search(value)
    if m is None:
        return None
    return (m.group(2), m.group(3))


@dataclass(frozen=True)
class EnclosureRef:
    """One enclosure produced by a single URL match.

    ``kind``     track | playlist | album
    ``state``    alive | dead (dead = provider fetch failed where the
                 reference would call ``.disable()``, src/scraper.rs:308-320)
    ``in_catalog`` whether the provider catalog had the item ("fetch ok")
    ``child_identifiers`` expanded member-track ids (YT/SC playlist expansion,
                 src/scraper.rs:322-370) — added to the TOP-LEVEL track list.
    ``nested_track_identifiers`` member tracks carried INSIDE a playlist
                 object without joining the top-level track list (Spotify
                 playlists via fetch_props, src/scraper.rs:286-290).
    """

    kind: str
    provider: str
    identifier: str
    owner_id: str | None = None
    state: str = STATE_ALIVE
    in_catalog: bool = False
    child_identifiers: tuple = ()
    nested_track_identifiers: tuple = ()


class Catalog:
    """Deterministic provider-catalog fixture: stands in for the live
    YouTube/SoundCloud/Spotify/AppleMusic REST APIs (reference:
    src/youtube.rs:202-258, src/soundcloud.rs:59-91, src/spotify.rs:243-404,
    src/apple_music.rs:377-459).  Keyed on (provider, kind, identifier).

    Small, dimension-sized: designed to be shipped to executors as a
    broadcast variable and consulted inside the extract pandas UDF.
    """

    def __init__(self, items: dict | None = None):
        # (provider, kind, identifier) -> dict of catalog fields
        self.items = items or {}

    def get(self, provider: str, kind: str, identifier: str):
        return self.items.get((provider, kind, identifier))

    def has(self, provider: str, kind: str, identifier: str) -> bool:
        return (provider, kind, identifier) in self.items

    def children(self, provider: str, kind: str, identifier: str) -> tuple:
        it = self.get(provider, kind, identifier)
        if not it:
            return ()
        return tuple(it.get("child_identifiers") or ())


EMPTY_CATALOG = Catalog()


def extract_enclosures_from_url(url: str, catalog: Catalog = EMPTY_CATALOG) -> list[EnclosureRef]:
    """The ordered match chain (reference: src/scraper.rs:372-490).

    Returns the enclosures a single iframe/anchor URL yields, in the order
    the reference would append them (playlists, albums, tracks are separated
    by ``kind``; expansion children are listed in catalog order).
    """
    decoded = unquote(url, errors="replace")

    # Apple Music song embed: fetch failure FALLS THROUGH (scraper.rs:375-383)
    ident = extract_identifier(decoded, AM_SONG_URL)
    if ident is not None:
        am_country(url)  # evaluated for parity; catalog fixture is country-less
        if catalog.has(PROVIDER_APPLE, "track", ident):
            return [EnclosureRef("track", PROVIDER_APPLE, ident, in_catalog=True)]
        # fall through

    # AM album embed: failure returns empty but STOPS (scraper.rs:384-394)
    ident = extract_identifier(decoded, AM_ALBUM_URL)
    if ident is not None:
        if catalog.has(PROVIDER_APPLE, "album", ident):
            return [EnclosureRef("album", PROVIDER_APPLE, ident, in_catalog=True)]
        return []

    # AM playlist embed: failure returns empty but STOPS (scraper.rs:395-405)
    ident = extract_identifier(decoded, AM_PLAYLIST_URL)
    if ident is not None:
        if catalog.has(PROVIDER_APPLE, "playlist", ident):
            return [EnclosureRef("playlist", PROVIDER_APPLE, ident, in_catalog=True)]
        return []

    # AM itunes album link with ?i=song: song fetch failure STOPS;
    # without ?i= falls through (scraper.rs:406-415)
    am_album = parse_am_url(decoded, AM_ALBUM_LINK)
    if am_album is not None:
        _country, _name, _id, song_id = am_album
        if song_id is not None:
            if catalog.has(PROVIDER_APPLE, "track", song_id):
                return [EnclosureRef("track", PROVIDER_APPLE, song_id, in_catalog=True)]
            return []
        # no ?i= -> fall through

    # AM itunes playlist link (scraper.rs:416-425)
    am_pl = parse_am_url(decoded, AM_PLAYLIST_LINK)
    if am_pl is not None:
        _country, _name, pl_id, _song = am_pl
        if catalog.has(PROVIDER_APPLE, "playlist", pl_id):
            return [EnclosureRef("playlist", PROVIDER_APPLE, pl_id, in_catalog=True)]
        return []

    # YouTube watch (scraper.rs:426-429); fetch err -> disabled track
    ident = extract_identifier(decoded, YOUTUBE_WATCH)
    if ident is not None:
        return [_yt_video(ident, catalog)]

    # YouTube playlist: expands member tracks (scraper.rs:430-433, 352-370)
    ident = extract_identifier(decoded, YOUTUBE_LIST)
    if ident is not None:
        children = catalog.children(PROVIDER_YOUTUBE, "playlist", ident)
        out: list[EnclosureRef] = []
        if catalog.has(PROVIDER_YOUTUBE, "playlist", ident):
            out.append(EnclosureRef("playlist", PROVIDER_YOUTUBE, ident,
                                    in_catalog=True, child_identifiers=children))
        # tracks come from fetch_playlist_items and are appended even when
        # the playlist metadata fetch fails (scraper.rs:352-369)
        out.extend(_yt_video(c, catalog) for c in children)
        return out

    # YouTube embed (scraper.rs:434-437)
    ident = extract_identifier(decoded, YOUTUBE_EMBED)
    if ident is not None:
        return [_yt_video(ident, catalog)]

    # SoundCloud track (scraper.rs:438-441)
    ident = extract_identifier(decoded, SOUNDCLOUD_TRACK)
    if ident is not None:
        return [_sc_track(ident, catalog)]

    # SoundCloud playlist: expansion; fetch err -> nothing (scraper.rs:442-445, 322-337)
    ident = extract_identifier(decoded, SOUNDCLOUD_PLAYLIST)
    if ident is not None:
        if not catalog.has(PROVIDER_SOUNDCLOUD, "playlist", ident):
            return []
        children = catalog.children(PROVIDER_SOUNDCLOUD, "playlist", ident)
        out = [EnclosureRef("playlist", PROVIDER_SOUNDCLOUD, ident,
                            in_catalog=True, child_identifiers=children)]
        out.extend(_sc_track(c, catalog) for c in children)
        return out

    # SoundCloud user: their tracks; fetch err -> nothing (scraper.rs:446-449, 339-350)
    ident = extract_identifier(decoded, SOUNDCLOUD_USER)
    if ident is not None:
        if not catalog.has(PROVIDER_SOUNDCLOUD, "user", ident):
            return []
        children = catalog.children(PROVIDER_SOUNDCLOUD, "user", ident)
        return [_sc_track(c, catalog) for c in children]

    # Spotify tracks: uri/open/embed; fetch err -> plain alive track
    for pat in (SPOTIFY_TRACK_URI, SPOTIFY_TRACK_OPEN, SPOTIFY_TRACK_EMBED):
        ident = extract_identifier(decoded, pat)
        if ident is not None:
            return [EnclosureRef("track", PROVIDER_SPOTIFY, ident,
                                 in_catalog=catalog.has(PROVIDER_SPOTIFY, "track", ident))]

    # Spotify playlists: uri/open/embed — playlist with nested tracks only
    # (fetch_props; members do NOT join the top-level track list,
    # scraper.rs:286-290 + test at scraper.rs:529-541)
    for pat in (SPOTIFY_PLAYLIST_URI, SPOTIFY_PLAYLIST_OPEN, SPOTIFY_PLAYLIST_EMBED):
        got = extract_identifier(decoded, pat)
        if got is not None:
            parsed = parse_spotify_playlist(decoded, pat)
            if parsed is None:
                continue
            uid, pid = parsed
            nested = catalog.children(PROVIDER_SPOTIFY, "playlist", pid)
            return [EnclosureRef("playlist", PROVIDER_SPOTIFY, pid, owner_id=uid,
                                 in_catalog=catalog.has(PROVIDER_SPOTIFY, "playlist", pid),
                                 nested_track_identifiers=nested)]

    # Spotify albums: uri/open/embed; fetch err -> plain album
    for pat in (SPOTIFY_ALBUM_URI, SPOTIFY_ALBUM_OPEN, SPOTIFY_ALBUM_EMBED):
        ident = extract_identifier(decoded, pat)
        if ident is not None:
            return [EnclosureRef("album", PROVIDER_SPOTIFY, ident,
                                 in_catalog=catalog.has(PROVIDER_SPOTIFY, "album", ident))]

    return []


def _yt_video(identifier: str, catalog: Catalog) -> EnclosureRef:
    ok = catalog.has(PROVIDER_YOUTUBE, "track", identifier)
    return EnclosureRef("track", PROVIDER_YOUTUBE, identifier,
                        state=STATE_ALIVE if ok else STATE_DEAD, in_catalog=ok)


def _sc_track(identifier: str, catalog: Catalog) -> EnclosureRef:
    ok = catalog.has(PROVIDER_SOUNDCLOUD, "track", identifier)
    return EnclosureRef("track", PROVIDER_SOUNDCLOUD, identifier,
                        state=STATE_ALIVE if ok else STATE_DEAD, in_catalog=ok)
