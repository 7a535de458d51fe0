"""The flagship extraction operator: HTML -> (content, text, enclosures, og, links).

Faithful re-expression of the reference's scraper pipeline
(reference: src/scraper.rs:75-205):

1. preprocess (drop script/style + unlikely nodes, br-br -> p)
2. DFS walk with path ids: collect og props + enclosures, score candidates
3. top-candidate selection: score *= (1 - link_density), strictly-greater
   wins, BTreeMap (lexicographic path) iteration order, default = document
4. clean the chosen subtree
5. serialize -> content; trimmed-text concatenation -> text

One addition for the crawl engine (north rule): discovered links
(absolute-ized hrefs of <a>/<link>) are collected during the same walk so
the frontier-enqueue step needs no second parse.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin

from . import providers, readability
from .htmldom import dom, parse_html, serialize
from .htmldom.dom import ELEMENT, Node
from .providers import Catalog, EMPTY_CATALOG, EnclosureRef
from .readability import Candidate, path_join, path_parent


@dataclass
class ExtractProduct:
    content: str
    text: str
    tracks: list = field(default_factory=list)       # list[EnclosureRef-like dict]
    playlists: list = field(default_factory=list)
    albums: list = field(default_factory=list)
    og_props: list = field(default_factory=list)     # ordered (key, value)
    links: list = field(default_factory=list)        # absolute discovered URLs

    @property
    def og(self) -> dict:
        """Scalar og fields, last-write-wins; images append (mirrors
        opengraph::Object::new consumption at src/model/entry.rs:340-348)."""
        obj: dict = {"images": []}
        for k, v in self.og_props:
            if k == "image":
                obj["images"].append(v)
            else:
                obj[k] = v
        return obj


def extract_opengraph_metadata_from_tag(tag_name: str, attrs: list) -> list:
    """reference: src/scraper.rs:242-271 (both property= and name= checked;
    key is the substring after 'og:')."""
    props = []
    if tag_name == "meta":
        for attr_name in ("property", "name"):
            prop = dom.attr(attr_name, attrs)
            if prop is not None and prop.startswith("og:"):
                content = dom.attr("content", attrs)
                if content is not None:
                    props.append((prop[3:], content))
    return props


def extract_enclosures_from_tag(tag_name: str, attrs: list,
                                catalog: Catalog) -> list[EnclosureRef]:
    """reference: src/scraper.rs:225-240 — iframes use src|data-src,
    anchors/links use href."""
    if tag_name == "iframe":
        src = dom.attr("src", attrs)
        if src is None:
            src = dom.attr("data-src", attrs)
        if src is not None:
            return providers.extract_enclosures_from_url(src, catalog)
        return []
    if tag_name in ("a", "link"):
        href = dom.attr("href", attrs)
        if href is not None:
            return providers.extract_enclosures_from_url(href, catalog)
        return []
    return []


def _ref_to_row(ref: EnclosureRef, doc_pos: int, child_pos: int) -> dict:
    return {
        "kind": ref.kind,
        "provider": ref.provider,
        "identifier": ref.identifier,
        "owner_id": ref.owner_id,
        "state": ref.state,
        "in_catalog": ref.in_catalog,
        "doc_pos": doc_pos,
        "child_pos": child_pos,
        "nested_track_identifiers": list(ref.nested_track_identifiers),
    }


class _Walker:
    """Single-pass DFS mirroring src/scraper.rs:140-205 plus link harvest."""

    def __init__(self, url: str, catalog: Catalog):
        self.url = url
        self.catalog = catalog
        self.candidates: dict[str, Candidate] = {}
        self.nodes: dict[str, Node] = {}
        self.tracks: list[dict] = []
        self.playlists: list[dict] = []
        self.albums: list[dict] = []
        self.og_props: list = []
        self.links: list[str] = []
        self._seen_track_keys: set = set()
        self._seen_playlist_keys: set = set()
        self._seen_album_keys: set = set()
        self._doc_pos = 0

    def _push(self, ref: EnclosureRef, doc_pos: int, child_pos: int) -> None:
        key = (ref.provider, ref.identifier)
        if ref.kind == "track":
            if key not in self._seen_track_keys:
                self._seen_track_keys.add(key)
                self.tracks.append(_ref_to_row(ref, doc_pos, child_pos))
        elif ref.kind == "playlist":
            if key not in self._seen_playlist_keys:
                self._seen_playlist_keys.add(key)
                self.playlists.append(_ref_to_row(ref, doc_pos, child_pos))
        elif ref.kind == "album":
            if key not in self._seen_album_keys:
                self._seen_album_keys.add(key)
                self.albums.append(_ref_to_row(ref, doc_pos, child_pos))

    def walk(self, path: str, node: Node) -> None:
        tag_name = dom.get_tag_name(node) or ""
        if node.kind == ELEMENT:
            self.og_props.extend(
                extract_opengraph_metadata_from_tag(tag_name, node.attrs))
            refs = extract_enclosures_from_tag(tag_name, node.attrs, self.catalog)
            if refs:
                doc_pos = self._doc_pos
                child_pos = 0
                for ref in refs:
                    self._push(ref, doc_pos, child_pos)
                    child_pos += 1
            self._doc_pos += 1
            # link harvest for the frontier (north-rule addition; the
            # reference's rss_crawler follows feed entries, not page links)
            if tag_name in ("a", "link"):
                href = dom.attr("href", node.attrs)
                if href:
                    try:
                        self.links.append(urljoin(self.url, href))
                    except ValueError:
                        pass

        self.nodes[path] = node

        if readability.is_candidate(node):
            score = readability.calc_content_score(node)
            pid = path_parent(path)
            if pid is not None:
                c = self._find_or_create_candidate(pid)
                if c is not None:
                    c.score = readability._f32(c.score + score)
            gpid = path_parent(pid) if pid is not None else None
            if gpid is not None:
                c = self._find_or_create_candidate(gpid)
                if c is not None:
                    c.score = readability._f32(c.score + readability._f32(score / readability._f32(2.0)))

        for i, child in enumerate(node.children):
            self.walk(path_join(path, i), child)

    def _find_or_create_candidate(self, path: str):
        node = self.nodes.get(path)
        if node is None:
            return None
        c = self.candidates.get(path)
        if c is None:
            c = self.candidates[path] = Candidate(
                node, readability.init_content_score(node))
        return c


def extract(html, url: str, catalog: Catalog = EMPTY_CATALOG) -> ExtractProduct:
    """Run the full pipeline over one page (reference: src/scraper.rs:75-134)."""
    document = parse_html(html)
    readability.preprocess(document)

    walker = _Walker(url, catalog)
    walker.walk("/", document)

    top_id = "/"
    top_node = document
    top_score = readability._f32(0.0)
    for path in sorted(walker.candidates):
        c = walker.candidates[path]
        score = readability._f32(
            c.score * readability._f32(
                readability._f32(1.0) - readability.get_link_density(c.node)))
        c.score = score
        if score <= top_score:
            continue
        top_id = path
        top_node = c.node
        top_score = score

    readability.clean(top_id, top_node, url, walker.candidates)
    content = serialize(top_node)

    parts: list = []
    dom.extract_text(top_node, parts, True)
    text = "".join(parts)

    return ExtractProduct(
        content=content,
        text=text,
        tracks=walker.tracks,
        playlists=walker.playlists,
        albums=walker.albums,
        og_props=walker.og_props,
        links=walker.links,
    )
