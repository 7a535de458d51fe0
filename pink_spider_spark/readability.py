"""Readability-style content scoring/cleaning.

Faithful re-expression of the reference's readability module
(reference: src/readability.rs), operating on the stdlib DOM in
``pink_spider_spark.htmldom``.  Scores use numpy float32 to mirror the
reference's ``f32`` accumulation.

Path ids: the reference keys candidates by filesystem-style path strings
("/", "/0", "/0/3") in a BTreeMap; iteration order is lexicographic on the
string ("/0/10" sorts before "/0/2"), which is observable in top-candidate
selection — reproduced here by sorting dict keys.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np

from .htmldom import dom
from .htmldom.dom import COMMENT, DOCTYPE, DOCUMENT, ELEMENT, TEXT, Node

# reference: src/readability.rs:22-41 (verbatim pattern constants)
PUNCTUATIONS_REGEX = r"([、。，．！？]|\.[^A-Za-z0-9]|,[^0-9]|!|\?)"
UNLIKELY_CANDIDATES = (
    "combx|comment|community|disqus|extra|foot|header|menu"
    "|remark|rss|shoutbox|sidebar|sponsor|ad-break|agegate"
    "|pagination|pager|popup|tweet|twitter"
    "|ssba"
)
LIKELY_CANDIDATES = "and|article|body|column|main|shadow|content|hentry"
POSITIVE_CANDIDATES = (
    "article|body|content|entry|hentry|main|page"
    "|pagination|post|text|blog|story"
)
NEGATIVE_CANDIDATES = (
    "combx|comment|com|contact|foot|footer|footnote"
    "|masthead|media|meta|outbrain|promo|related"
    "|scroll|shoutbox|sidebar|sponsor|shopping"
    "|tags|tool|widget|form|textfield"
    "|uiScale|hidden"
)
BLOCK_CHILD_TAGS = frozenset(
    ["a", "blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul"]
)

PUNCTUATIONS = re.compile(PUNCTUATIONS_REGEX)
LIKELY = re.compile(LIKELY_CANDIDATES)
UNLIKELY = re.compile(UNLIKELY_CANDIDATES)
POSITIVE = re.compile(POSITIVE_CANDIDATES)
NEGATIVE = re.compile(NEGATIVE_CANDIDATES)

_f32 = np.float32


class Candidate:
    __slots__ = ("node", "score")

    def __init__(self, node: Node, score):
        self.node = node
        self.score = _f32(score)


# ---------------------------------------------------------------- paths
def path_join(path: str, index: int) -> str:
    return f"/{index}" if path == "/" else f"{path}/{index}"


def path_parent(path: str) -> str | None:
    if path == "/":
        return None
    head, _, _ = path.rpartition("/")
    return head if head else "/"


# ------------------------------------------------------------- scoring
def fix_img_path(node: Node, base_url: str) -> bool:
    """reference: src/readability.rs:56-69.  Quirk preserved: only
    absolute https:// srcs are re-joined (a no-op for normalized URLs);
    relative srcs are never fixed.  Returns False only when no src."""
    src = dom.get_attr("src", node)
    if src is None:
        return False
    if not src.startswith("//") and not src.startswith("http://") and src.startswith("https://"):
        try:
            dom.set_attr("src", urljoin(base_url, src), node)
        except ValueError:
            pass
    return True


def get_link_density(node: Node) -> np.float32:
    """reference: src/readability.rs:71-83 (f32 division)."""
    text_length = _f32(dom.text_len(node))
    if text_length == _f32(0.0):
        return _f32(0.0)
    links: list[Node] = []
    dom.find_node(node, "a", links)
    link_length = _f32(0.0)
    for link in links:
        link_length = _f32(link_length + _f32(dom.text_len(link)))
    return _f32(link_length / text_length)


def is_candidate(node: Node) -> bool:
    """reference: src/readability.rs:85-103."""
    # early-exit bound: identical to text_len(node) < 20, without
    # summing whole-page subtrees to compare against 20
    if not dom.text_len_reaches(node, 20):
        return False
    tag = dom.get_tag_name(node) or ""
    if tag == "p":
        return True
    if tag in ("div", "article", "center", "section"):
        if not dom.has_nodes(node, BLOCK_CHILD_TAGS):
            return True
        return dom.text_children_count(node) > 5
    return False


def init_content_score(node: Node) -> np.float32:
    """reference: src/readability.rs:105-116."""
    tag = dom.get_tag_name(node) or ""
    score = {
        "article": 10.0,
        "div": 5.0,
        "blockquote": 3.0,
        "form": -3.0,
        "th": 5.0,
    }.get(tag, 0.0)
    return _f32(_f32(score) + get_class_weight(node))


def calc_content_score(node: Node) -> np.float32:
    """reference: src/readability.rs:118-126."""
    score = _f32(1.0)
    parts: list = []
    dom.extract_text(node, parts, True)
    text = "".join(parts)
    score = _f32(score + _f32(len(PUNCTUATIONS.findall(text))))
    score = _f32(score + min(_f32(np.floor(_f32(len(text)) / _f32(100.0))), _f32(3.0)))
    return score


def get_class_weight(node: Node) -> np.float32:
    """reference: src/readability.rs:128-146."""
    weight = _f32(0.0)
    if node.kind == ELEMENT:
        for name in ("id", "class"):
            val = dom.attr(name, node.attrs)
            if val is not None:
                if POSITIVE.search(val):
                    weight = _f32(weight + _f32(25.0))
                if NEGATIVE.search(val):
                    weight = _f32(weight - _f32(25.0))
    return weight


# ---------------------------------------------------------- preprocess
def preprocess(node: Node) -> bool:
    """Drop script/style + unlikely-candidate elements; wrap <br><br>text
    runs in fresh <p> elements.  Returns True when the caller must remove
    this node (reference: src/readability.rs:148-214)."""
    if node.kind == ELEMENT:
        tag = node.tag or ""
        if tag in ("script", "style"):
            return True
        for name in ("id", "class"):
            val = dom.attr(name, node.attrs)
            if val is not None:
                if tag != "body" and UNLIKELY.search(val):
                    if not LIKELY.search(val):
                        return True

    useless_nodes: list[Node] = []
    paragraph_nodes: list[Node] = []
    br_count = 0
    for child in list(node.children):
        if preprocess(child):
            useless_nodes.append(child)
        if child.kind == ELEMENT:
            if child.tag == "br":
                br_count += 1
            else:
                br_count = 0
        elif child.kind == TEXT:
            if br_count >= 2 and len(child.text.strip()) > 0:
                paragraph_nodes.append(child)
                br_count = 0
    for n in useless_nodes:
        n.remove_from_parent()
    for n in paragraph_nodes:
        p = Node(ELEMENT, "p")
        parent = n.parent
        if parent is None:
            continue
        parent.insert_before(p, n)
        n.remove_from_parent()
        p.append(Node(TEXT, text=n.text))
    return False


# --------------------------------------------------------------- clean
def clean(path: str, node: Node, base_url: str, candidates: dict) -> bool:
    """Remove chrome/uselss subtrees under the chosen top candidate;
    returns True when the caller must remove this node
    (reference: src/readability.rs:216-261)."""
    useless = False
    if node.kind in (DOCUMENT, DOCTYPE):
        pass
    elif node.kind == TEXT:
        if len(node.text.strip()) == 0:
            useless = True
    elif node.kind == COMMENT:
        useless = True
    elif node.kind == ELEMENT:
        tag = node.tag or ""
        if tag in ("script", "link", "style", "noscript", "meta",
                   "h1", "object", "header", "footer", "aside"):
            useless = True
        elif tag in ("form", "table", "ul", "div"):
            useless = is_useless(path, node, candidates)
        elif tag == "img":
            useless = not fix_img_path(node, base_url)
        dom.remove_attr("id", node)
        dom.remove_attr("class", node)
        dom.remove_attr("style", node)

    useless_nodes: list[Node] = []
    for i, child in enumerate(node.children):
        pid = path_join(path, i)
        if clean(pid, child, base_url, candidates):
            useless_nodes.append(child)
    for n in useless_nodes:
        n.remove_from_parent()
    if dom.is_empty(node):
        useless = True
    return useless


def is_useless(path: str, node: Node, candidates: dict) -> bool:
    """reference: src/readability.rs:263-311."""
    tag_name = dom.get_tag_name(node) or ""
    weight = get_class_weight(node)
    cand = candidates.get(path)
    score = cand.score if cand is not None else _f32(0.0)
    if _f32(weight + score) < _f32(0.0):
        return True

    text_nodes_len = dom.text_children_count(node)
    p_nodes: list[Node] = []
    img_nodes: list[Node] = []
    li_nodes: list[Node] = []
    input_nodes: list[Node] = []
    embed_nodes: list[Node] = []
    dom.find_node(node, "p", p_nodes)
    dom.find_node(node, "img", img_nodes)
    dom.find_node(node, "li", li_nodes)
    dom.find_node(node, "input", input_nodes)
    dom.find_node(node, "embed", embed_nodes)
    p_count = len(p_nodes)
    img_count = len(img_nodes)
    li_count = len(li_nodes) - 100
    input_count = len(input_nodes)
    embed_count = len(embed_nodes)
    link_density = get_link_density(node)
    content_length = dom.text_len(node)
    para_count = text_nodes_len + p_count

    if img_count > para_count + text_nodes_len:
        return True
    if li_count > para_count and tag_name != "ul" and tag_name != "ol":
        return True
    if _f32(input_count) > _f32(np.floor(_f32(para_count) / _f32(3.0))):
        return True
    if content_length < 25 and (img_count == 0 or img_count > 2):
        return True
    if weight < _f32(25.0) and link_density > _f32(0.2):
        return True
    if (embed_count == 1 and content_length < 35) or embed_count > 1:
        return True
    return False
