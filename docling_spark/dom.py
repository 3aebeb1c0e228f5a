"""Minimal HTML DOM built on the stdlib ``html.parser.HTMLParser``.

This replicates the tree-building semantics of BeautifulSoup's
``html.parser`` tree builder (the parser the reference engine pins for its
extraction semantics, cf. ``/root/reference/docling/backend/html_backend.py:482``)
without depending on bs4:

- no HTML5 implied-end-tag rules: an unclosed ``<p>`` nests the following
  content (the reference repairs this itself in a later pass);
- void elements (``br``, ``img``, ...) never take children;
- an end tag pops the open-element stack up to the nearest matching start
  tag and is ignored when nothing matches;
- character references are decoded in normal content but left verbatim
  inside ``script``/``style`` (CDATA content model);
- comments/doctypes are kept as distinct node types that text extraction
  skips.

The node API is intentionally tiny - just what the extractor needs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Callable, Iterable, Iterator, Optional, Union

# bs4.builder.HTMLTreeBuilder.empty_element_tags (public bs4 behavior)
VOID_ELEMENTS = {
    "area", "base", "br", "basefont", "bgsound", "col", "command", "embed",
    "frame", "hr", "image", "img", "input", "isindex", "keygen", "link",
    "menuitem", "meta", "nextid", "param", "source", "spacer", "track", "wbr",
}

NodeLike = Union["Element", "TextNode"]


class TextNode:
    """A text (or comment) node."""

    __slots__ = ("data", "parent", "is_comment")

    def __init__(self, data: str, is_comment: bool = False):
        self.data = data
        self.parent: Optional[Element] = None
        self.is_comment = is_comment

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.data!r})"

    def extract(self) -> "TextNode":
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self


class Element:
    """An element node with lowercase tag name and last-wins attributes."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None):
        self.name = name
        self.attrs: dict = attrs or {}
        self.children: list[NodeLike] = []
        self.parent: Optional[Element] = None

    # -- construction ------------------------------------------------------
    def append(self, node: NodeLike) -> None:
        node.parent = self
        self.children.append(node)

    def insert(self, index: int, node: NodeLike) -> None:
        node.parent = self
        self.children.insert(index, node)

    # -- bs4-ish accessors ---------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def get_classes(self) -> set[str]:
        raw = self.attrs.get("class")
        if not raw:
            return set()
        return set(raw.split())

    @property
    def contents(self) -> list[NodeLike]:
        return self.children

    def descendants(self) -> Iterator[NodeLike]:
        # iterative pre-order DFS over an explicit LIFO - this is the
        # hottest path in extraction (trees hold only Element/TextNode,
        # so the cheap class-identity test stands in for isinstance)
        stack = self.children[::-1]
        pop = stack.pop
        while stack:
            node = pop()
            yield node
            if node.__class__ is not TextNode and node.children:
                stack.extend(node.children[::-1])

    def iter_elements(self) -> Iterator["Element"]:
        for node in self.descendants():
            if isinstance(node, Element):
                yield node

    def find_all(
        self,
        names: Union[str, Iterable[str], None] = None,
        recursive: bool = True,
        pred: Optional[Callable[["Element"], bool]] = None,
    ) -> list["Element"]:
        if isinstance(names, str):
            names = {names}
        elif names is not None:
            names = set(names)
        out: list[Element] = []
        if recursive:
            # fused pre-order DFS (no generator frame per node)
            stack = self.children[::-1]
            pop = stack.pop
            while stack:
                node = pop()
                if node.__class__ is TextNode:
                    continue
                if ((names is None or node.name in names)
                        and (pred is None or pred(node))):
                    out.append(node)
                if node.children:
                    stack.extend(node.children[::-1])
            return out
        for node in self.children:
            if node.__class__ is TextNode:
                continue
            if names is not None and node.name not in names:
                continue
            if pred is not None and not pred(node):
                continue
            out.append(node)
        return out

    def find(
        self,
        names: Union[str, Iterable[str], None] = None,
        recursive: bool = True,
        pred: Optional[Callable[["Element"], bool]] = None,
    ) -> Optional["Element"]:
        # early-exit pre-order DFS: same first match as
        # find_all(...)[0] without materializing every later match
        if isinstance(names, str):
            names = {names}
        elif names is not None:
            names = set(names)
        if recursive:
            stack = self.children[::-1]
            pop = stack.pop
            while stack:
                node = pop()
                if node.__class__ is TextNode:
                    continue
                if ((names is None or node.name in names)
                        and (pred is None or pred(node))):
                    return node
                if node.children:
                    stack.extend(node.children[::-1])
            return None
        for node in self.children:
            if node.__class__ is TextNode:
                continue
            if names is not None and node.name not in names:
                continue
            if pred is not None and not pred(node):
                continue
            return node
        return None

    def find_parent(self, name: str) -> Optional["Element"]:
        cur = self.parent
        while cur is not None:
            if cur.name == name:
                return cur
            cur = cur.parent
        return None

    def parents(self) -> Iterator["Element"]:
        cur = self.parent
        while cur is not None:
            yield cur
            cur = cur.parent

    def text_nodes(self) -> Iterator[TextNode]:
        for node in self.descendants():
            if isinstance(node, TextNode) and not node.is_comment:
                yield node

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = []
        for tn in self.text_nodes():
            s = tn.data.strip() if strip else tn.data
            if s or not strip:
                parts.append(s)
        return separator.join(parts)

    # -- mutation ------------------------------------------------------------
    def extract(self) -> "Element":
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self

    def decompose(self) -> None:
        self.extract()
        self.children = []

    def unwrap(self) -> None:
        """Replace this element with its children (bs4 ``unwrap``)."""
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        kids = list(self.children)
        parent.children[idx:idx + 1] = kids
        for kid in kids:
            kid.parent = parent
        self.parent = None
        self.children = []

    def replace_with(self, node: NodeLike) -> None:
        parent = self.parent
        if parent is None:
            return
        idx = parent.children.index(self)
        parent.children[idx] = node
        node.parent = parent
        self.parent = None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} attrs={self.attrs} kids={len(self.children)}>"


class Document(Element):
    """Root node; may hold multiple top-level children."""

    def __init__(self) -> None:
        super().__init__("[document]")

    @property
    def body(self) -> Optional[Element]:
        return self.find("body")

    @property
    def title_tag(self) -> Optional[Element]:
        return self.find("title")


# Whitespace inside these tags is significant and never collapsed
# (bs4 ``preserve_whitespace_tags``).
PRESERVE_WHITESPACE_TAGS = {"pre", "textarea"}


class _TreeParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]
        self._data_parts: list[str] = []
        self._preserve_depth = 0

    def _end_data(self) -> None:
        """Flush buffered character data, collapsing whitespace-only runs to
        a single '\\n' (if one is present) or ' ' - the same normalization
        BeautifulSoup applies in ``endData`` outside pre/textarea."""
        if not self._data_parts:
            return
        data = "".join(self._data_parts)
        self._data_parts.clear()
        if not data:
            return
        if self._preserve_depth == 0 and not data.strip():
            data = "\n" if "\n" in data else " "
        self.stack[-1].append(TextNode(data))

    # html.parser lowercases tag and attribute names already.
    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._end_data()
        el = Element(tag, dict(attrs))
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)
            if tag in PRESERVE_WHITESPACE_TAGS:
                self._preserve_depth += 1

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self._end_data()
        self.stack[-1].append(Element(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        self._end_data()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                for popped in self.stack[i:]:
                    if popped.name in PRESERVE_WHITESPACE_TAGS:
                        self._preserve_depth -= 1
                del self.stack[i:]
                return
        # no matching start tag: ignore

    def handle_data(self, data: str) -> None:
        if data:
            self._data_parts.append(data)

    def handle_comment(self, data: str) -> None:
        self._end_data()
        self.stack[-1].append(TextNode(data, is_comment=True))

    # Doctype declarations, processing instructions: dropped.
    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass

    def unknown_decl(self, data: str) -> None:
        pass


_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I)
_XML_ENCODING_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']""", re.I)


def sniff_charset(raw: bytes) -> Optional[str]:
    """Best-effort charset sniff: BOM, then <meta charset=...> /
    http-equiv content-type / XML declaration in the first 4 KiB.

    Returns a validated codec name or None. Mirrors how the reference's
    BeautifulSoup backend honors declared charsets
    (``/root/reference/docling/backend/html_backend.py`` uses bs4's
    UnicodeDammit); we sniff the same signals without vendoring bs4.
    """
    import codecs
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith((b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff")):
        return "utf-32"
    if raw.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    head = raw[:4096]
    m = _META_CHARSET_RE.search(head) or _XML_ENCODING_RE.search(head)
    if m:
        name = m.group(1).decode("ascii", errors="replace")
        try:
            return codecs.lookup(name).name
        except LookupError:
            return None
    return None


def decode_html_bytes(raw: bytes) -> str:
    """Decode page bytes to text.

    Order: strict UTF-8 first (the dominant web case, and what every golden
    fixture is stored as); on failure, the sniffed declared charset with
    replacement; final fallback UTF-8 with replacement. Non-UTF-8 pages
    (Latin-1, Shift-JIS, GBK, ...) thus decode via their declared charset
    instead of turning into U+FFFD mojibake.
    """
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    charset = sniff_charset(raw)
    if charset is not None:
        try:
            return raw.decode(charset, errors="replace")
        except (UnicodeDecodeError, LookupError, ValueError):
            pass
    return raw.decode("utf-8", errors="replace")


def parse_html(raw: Union[bytes, str]) -> Document:
    """Parse HTML bytes/text into a :class:`Document`.

    Bytes are decoded via :func:`decode_html_bytes` (strict UTF-8 ->
    declared-charset fallback -> UTF-8/replace).
    """
    if isinstance(raw, bytes):
        text = decode_html_bytes(raw)
    else:
        text = raw
    parser = _TreeParser()
    parser.feed(text)
    parser.close()
    parser._end_data()
    return parser.root
