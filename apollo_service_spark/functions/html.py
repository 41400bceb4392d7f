"""Pure-Python HTML engine shared by the local oracle and the pandas UDFs.

Reimplements, from scratch on the stdlib ``html.parser`` (no bs4/markdownify
dependency), the *semantics* of the reference content extractor
(`/root/reference/app/services/apollo_scrape/scraper.py:211-292`) and link
extractor (`apollo.py:359-371`):

* decompose header/footer/nav/aside/script/style/div nodes carrying one of the
  reference's strip-class names, plus every img/figure/picture/svg;
* remove "Apply Now" sections (walk ≤3 ancestors for a section/div/form, else
  drop following form siblings and the heading itself);
* select content nodes ([article, section, main, div, p] with one of the
  content class names), falling back to <body>;
* title = <title> string, else first <h1> text, else "untitled"; cleaned via
  the reference's two regexp passes;
* ATX-heading markdown conversion, then strip image-markdown and image URLs.

Because BOTH the test oracle and the Spark pandas UDF call these exact
functions, the byte-identical-text-per-url invariant reduces to "the
vectorized path calls the same pure function per row", which the tests verify.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

# Class names the reference extractor decomposes (scraper.py:215-220).
STRIP_CLASSES = frozenset(
    {
        "mobile-login-field-small-wrapper",
        "sub-page-links-wrapper",
        "header-main-subpages",
        "related-links-wrapper",
        "content-wrapper",
        "mobile-header-main",
        "mm-header-nav-links",
        "top-bar",
        "login-field-small-wrapper-subpages",
        "form-small-wrapper",
        "side-nav-inner-page",
        "footer-wrapper",
        "mobile-copyrights-wrapper",
        "privacy-links-wrapper",
        "bread-crums-wrapper",
        "dcp-form",
    }
)
STRIP_TAGS = frozenset({"header", "footer", "nav", "aside", "script", "style", "div"})
ALWAYS_STRIP_TAGS = frozenset({"img", "figure", "picture", "svg"})

# Content-selection classes (scraper.py:254-256).
CONTENT_CLASSES = frozenset(
    {
        "content",
        "article-body",
        "main-content",
        "show",
        "main-heading",
        "tab-content inner-txt-bx",
        "container",
    }
)
CONTENT_TAGS = frozenset({"article", "section", "main", "div", "p"})

VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_IMG_MD_RE = re.compile(r"!\[.*?\]\(.*?\)")
_IMG_URL_RE = re.compile(
    r"https?://\S+\.(jpg|jpeg|png|gif|svg|webp)(\?\S+)?", re.IGNORECASE
)
_TITLE_CLEAN1 = re.compile(r"[^\w\s-]")
_TITLE_CLEAN2 = re.compile(r"[-\s]+")
_WS_RE = re.compile(r"\s+")


class Node:
    """Minimal mutable DOM node."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag, attrs=None, parent=None, text=None):
        self.tag = tag  # None for text nodes
        self.attrs = attrs or {}
        self.children = []
        self.parent = parent
        self.text = text

    @property
    def classes(self):
        return self.attrs.get("class", "").split()

    def decompose(self):
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    def iter(self):
        yield self
        # children may be mutated by callers between yields; snapshot.
        for child in list(self.children):
            if child.parent is self:
                yield from child.iter()

    def find_all(self, tags=None, classes=None):
        out = []
        for node in self.iter():
            if node.tag is None:
                continue
            if tags is not None and node.tag not in tags:
                continue
            if classes is not None and not any(c in classes for c in node.classes):
                # also match full class-attribute string (reference passes
                # multi-word class names like "tab-content inner-txt-bx")
                if node.attrs.get("class", "") not in classes:
                    continue
            out.append(node)
        return out

    def get_text(self, strip=False):
        parts = []
        for node in self.iter():
            if node.tag is None and node.text:
                parts.append(node.text)
        text = "".join(parts)
        return text.strip() if strip else text


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(
                Node(None, parent=self.stack[-1], text=data)
            )


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        pass
    return builder.root


# --------------------------------------------------------------------------
# Markdown conversion (ATX heading style, markdownify-like subset)
# --------------------------------------------------------------------------

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "header", "footer",
        "nav", "aside", "table", "tr", "ul", "ol", "blockquote", "pre",
        "form", "body", "html", "[document]",
    }
)


def _inline_text(node: Node) -> str:
    """Render a node's inline content to markdown text."""
    if node.tag is None:
        return _WS_RE.sub(" ", node.text or "")
    tag = node.tag
    inner = "".join(_inline_text(c) for c in node.children)
    if tag in ("strong", "b"):
        body = inner.strip()
        return f"**{body}**" if body else ""
    if tag in ("em", "i"):
        body = inner.strip()
        return f"*{body}*" if body else ""
    if tag == "code":
        body = inner.strip()
        return f"`{body}`" if body else ""
    if tag == "a":
        href = node.attrs.get("href", "")
        body = inner.strip()
        if not body:
            return ""
        return f"[{body}]({href})" if href else body
    if tag == "br":
        return "\n"
    return inner


def _render_blocks(node: Node, out: list, list_depth: int = 0) -> None:
    for child in list(node.children):
        tag = child.tag
        if tag is None:
            text = _WS_RE.sub(" ", child.text or "").strip()
            if text:
                out.append(text)
            continue
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(tag[1])
            text = _inline_text(child).strip()
            if text:
                out.append("#" * level + " " + text)
            continue
        if tag in ("ul", "ol"):
            _render_list(child, out, list_depth)
            continue
        if tag == "pre":
            text = child.get_text()
            text = text.strip("\n")
            if text:
                out.append("```\n" + text + "\n```")
            continue
        if tag == "blockquote":
            inner: list = []
            _render_blocks(child, inner, list_depth)
            for block in inner:
                out.append("> " + block)
            continue
        if tag == "table":
            for row in child.find_all(tags={"tr"}):
                cells = [
                    _inline_text(c).strip()
                    for c in row.children
                    if c.tag in ("td", "th")
                ]
                if any(cells):
                    out.append("| " + " | ".join(cells) + " |")
            continue
        if tag == "p":
            text = _inline_text(child).strip()
            if text:
                out.append(text)
            continue
        if tag in _BLOCK_TAGS:
            _render_blocks(child, out, list_depth)
            continue
        # inline element at block level: render as its own paragraph chunk
        text = _inline_text(child).strip()
        if text:
            out.append(text)


def _render_list(node: Node, out: list, depth: int) -> None:
    idx = 1
    for li in node.children:
        if li.tag != "li":
            continue
        text = _inline_text(li).strip()
        bullet = f"{idx}. " if node.tag == "ol" else "* "
        if text:
            out.append("  " * depth + bullet + text)
        for sub in li.children:
            if sub.tag in ("ul", "ol"):
                _render_list(sub, out, depth + 1)
        idx += 1


def to_markdown(nodes) -> str:
    """ATX-style markdown of the given node or node list."""
    if isinstance(nodes, Node):
        nodes = [nodes]
    blocks: list = []
    for node in nodes:
        wrapper = Node("[wrap]")
        wrapper.children = [node]
        _render_blocks(wrapper, blocks)
    return "\n\n".join(blocks)


# --------------------------------------------------------------------------
# The extractor (reference scraper.py:211-292 semantics)
# --------------------------------------------------------------------------


def extract_text(html: str) -> tuple:
    """Return (markdown, clean_title, page_title); ("","","") on failure."""
    if not html:
        return "", "", ""
    try:
        root = parse_html(html)

        for node in root.find_all(tags=STRIP_TAGS, classes=STRIP_CLASSES):
            node.decompose()
        for node in root.find_all(tags=ALWAYS_STRIP_TAGS):
            node.decompose()

        # "Apply Now" section removal (scraper.py:235-252)
        for heading in root.find_all(tags={"h1", "h2", "h3", "h4", "h5", "h6"}):
            if heading.parent is None:
                continue
            if heading.get_text(strip=True).lower() != "apply now":
                continue
            parent_to_remove = None
            current = heading
            for _ in range(3):
                if current.parent is not None:
                    current = current.parent
                    if current.tag in ("section", "div", "form"):
                        parent_to_remove = current
                        break
            if parent_to_remove is not None:
                parent_to_remove.decompose()
            else:
                parent = heading.parent
                if parent is not None:
                    siblings = parent.children
                    start = siblings.index(heading) + 1
                    for elem in list(siblings[start:]):
                        if elem.tag == "form" or "form" in elem.classes:
                            elem.decompose()
                heading.decompose()

        content = root.find_all(tags=CONTENT_TAGS, classes=CONTENT_CLASSES)
        if not content:
            bodies = root.find_all(tags={"body"})
            content = bodies[0] if bodies else None
        if not content:
            return "", "", ""

        title_nodes = root.find_all(tags={"title"})
        page_title = None
        if title_nodes:
            raw = title_nodes[0].get_text()
            if raw:
                page_title = raw.strip()
        if page_title is None:
            h1s = root.find_all(tags={"h1"})
            page_title = h1s[0].get_text(strip=True) if h1s else "untitled"

        clean_title = _TITLE_CLEAN1.sub("", page_title).strip()
        clean_title = _TITLE_CLEAN2.sub("-", clean_title)
        if not clean_title:
            clean_title = "untitled-content"

        markdown = to_markdown(content)
        markdown = _IMG_MD_RE.sub("", markdown)
        markdown = _IMG_URL_RE.sub("", markdown)
        return markdown, clean_title, page_title
    except Exception:
        return "", "", ""


def extract_text_only(html) -> str:
    """Markdown text only — the per-row invariant column (handles bytes)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        try:
            html = bytes(html).decode("utf-8", errors="replace")
        except Exception:
            return ""
    return extract_text(html)[0]


# --------------------------------------------------------------------------
# Link extraction (reference apollo.py:359-371 semantics)
# --------------------------------------------------------------------------

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:")


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for key, val in attrs:
                if key == "href" and val:
                    self.hrefs.append(val)


def extract_links(html, base_url: str) -> list:
    """All absolute, fragment-stripped a[href] links, distinct + sorted.

    The reference returns a Python set; we pin a sorted list so every
    downstream consumer is deterministic.
    """
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        try:
            html = bytes(html).decode("utf-8", errors="replace")
        except Exception:
            return []
    parser = _LinkParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    links = set()
    for href in parser.hrefs:
        # HTMLParser entity-decodes attribute values during parsing (same as
        # bs4 in the reference, apollo.py:359-371); a second unescape() here
        # would double-decode '&amp;amp;'-style hrefs and change canonical urls
        href = href.strip()
        if not href or href.startswith(_SKIP_SCHEMES):
            continue
        try:
            full = urljoin(base_url, href)
        except ValueError:
            continue
        full = full.split("#", 1)[0]
        if full:
            links.add(full)
    return sorted(links)
