"""From-scratch HTML -> Doc extraction with the reference's semantics.

Reimplements the observable behavior of the reference HTML backend
(``/root/reference/docling/backend/html_backend.py``, semantics documented in
SURVEY.md §2.C) on top of the stdlib-parser DOM in :mod:`docling_spark.dom`:

- boilerplate strip (script/noscript/style + ``hidden`` tags), invisible-tag
  filtering (aria-hidden, inline display:none styles);
- browser-style repair of ``<p>`` containing block-level elements;
- ``<br>`` sentinel normalization (1x br -> newline, 2+ -> paragraph split);
- inline-text buffering across format tags with run simplification and
  inline groups for mixed-formatting flows;
- heading hierarchy with invisible section groups bridging level jumps;
- ul/ol/dl lists with ``start`` numbering and nested block content;
- tables with row/col span grid arithmetic and rich-cell sub-walks;
- fixed unicode cleanup table; furniture inference before first heading.

Everything here is a pure function of the HTML bytes - no I/O, no globals -
so it can run vectorized inside Arrow-batched Spark UDFs.
"""

from __future__ import annotations

import posixpath
import re
from contextlib import contextmanager
from typing import Iterator, Optional, Union

from .clean import clean_unicode, detect_code_language, normalize_code_language, HINT_PREFIXES
from .dom import Document, Element, TextNode, parse_html
from .model import (
    BODY,
    FURNITURE,
    Doc,
    Formatting,
    TableCell,
    TableData,
)

# Sentinel for explicit <br> line breaks (private use area), same trick as
# the reference (html_backend.py:83).
BR_SENTINEL = ""

BLOCK_TAGS = {
    "address", "details", "dl", "figure", "footer", "img",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ol", "p", "pre", "signature", "stamp", "summary", "table", "ul",
}

PARA_BREAKERS = {
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figcaption", "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5",
    "h6", "header", "hr", "main", "nav", "ol", "ul", "li", "p", "pre",
    "section", "table", "thead", "tbody", "tfoot", "tr", "td",
}

CODE_TAGS = {"code", "kbd", "samp"}

FORMAT_TAG_MAP: dict[str, dict] = {
    "b": {"bold": True},
    "strong": {"bold": True},
    "i": {"italic": True},
    "em": {"italic": True},
    "var": {"italic": True},
    "s": {"strikethrough": True},
    "del": {"strikethrough": True},
    "u": {"underline": True},
    "ins": {"underline": True},
    "sub": {"script": "sub"},
    "sup": {"script": "super"},
    "code": {},
    "kbd": {},
    "samp": {},
}

INLINE_HTML_TAGS = {
    "a", "abbr", "b", "bdi", "bdo", "cite", "code", "data", "dfn", "em",
    "i", "kbd", "label", "mark", "q", "s", "samp", "small", "span",
    "strong", "sub", "sup", "u", "var",
}

CUSTOM_CHECKBOX_CLASSES = {"checkbox", "checkbox-box", "checkbox-input"}
CHECKBOX_MARK_TEXTS = {"x", "✓", "✔", "☑"}
CHECKBOX_CONTAINER_CLASSES = {
    "checkbox-container", "checkbox-item", "checkbox-option", "option",
}

_HEADING_NAMES = {"h1", "h2", "h3", "h4", "h5", "h6"}

_WS_RE = re.compile(r"\s+|\n+")
_NL_SPACE_RE = re.compile(r" *\n *")

_URL_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$")
# hot-loop patterns precompiled (identical regexes; skips the per-call
# re-module cache lookup on the extraction hot path)
_WS_ANY_RE = re.compile(r"\s+")
_OPACITY0_RE = re.compile(r"opacity:0(?:[;]|$)")
_DISPLAY_RE = re.compile(r"display\s*:\s*([^;]+)", re.I)
_DIGITS_RE = re.compile(r"\d+")

FORM_CONTAINER_CLASS = "form_region"
_FORM_KEY_ID_RE = re.compile(r"^key(?P<key_id>[A-Za-z0-9]+)$")
_FORM_MARKER_ID_RE = re.compile(r"^key(?P<key_id>[A-Za-z0-9]+)_marker$")
_FORM_VALUE_ID_RE = re.compile(
    r"^key(?P<key_id>[A-Za-z0-9]+)_value(?P<value_id>[A-Za-z0-9]+)$")


def normalize_hyperlink(href: str) -> str:
    """Mimic pydantic ``AnyUrl`` / ``Path`` normalization used by the
    reference for hyperlink values (html_backend.py:1955-1966)."""
    href = href.strip()
    m = _URL_RE.match(href)
    if m:
        scheme, host, path, query, frag = m.groups()
        out = scheme.lower() + "://" + host.lower() + (path or "/")
        if query:
            out += query
        if frag:
            out += frag
        return out
    # Path(...) normalization: collapse //, strip ./ and trailing /
    if not href:
        return href
    norm = posixpath.normpath(href) if href not in {"#", ""} else href
    # posixpath.normpath("") == "."; keep fragments/empty untouched
    if norm == ".":
        return href
    return norm


class AnnotatedText:
    __slots__ = ("text", "hyperlink", "formatting", "code")

    def __init__(self, text: str, hyperlink=None, formatting=None, code=False):
        self.text = text
        self.hyperlink = hyperlink
        self.formatting = formatting
        self.code = code

    def copy(self) -> "AnnotatedText":
        return AnnotatedText(self.text, self.hyperlink, self.formatting, self.code)


class AnnotatedTextList(list):
    def to_single_text_element(self) -> AnnotatedText:
        cur_h = None
        cur_text = ""
        cur_f = None
        cur_code = False
        for at in self:
            cur_text += at.text.strip() + " "
            if at.formatting is not None and cur_f is None:
                cur_f = at.formatting
            if at.hyperlink is not None and cur_h is None:
                cur_h = at.hyperlink
            cur_code = at.code if at.code else cur_code
        return AnnotatedText(cur_text.strip(), cur_h, cur_f, cur_code)

    def simplify(self) -> "AnnotatedTextList":
        simplified = AnnotatedTextList()
        if not self:
            return self
        text = self[0].text
        hyperlink = self[0].hyperlink
        formatting = self[0].formatting
        code = self[0].code
        last_elm = text
        for i in range(1, len(self)):
            el = self[i]
            if (hyperlink == el.hyperlink and formatting == el.formatting
                    and code == el.code):
                sep = " "
                if not el.text.strip() or not last_elm.strip():
                    sep = ""
                text += sep + el.text
                last_elm = el.text
            else:
                simplified.append(AnnotatedText(text, hyperlink, formatting, code))
                text = el.text
                last_elm = text
                hyperlink = el.hyperlink
                formatting = el.formatting
                code = el.code
        if text:
            simplified.append(AnnotatedText(text, hyperlink, formatting, code))
        return simplified

    def split_by_newline(self) -> list["AnnotatedTextList"]:
        """1x sentinel -> \\n within the paragraph; 2+ -> paragraph break."""
        super_list: list[AnnotatedTextList] = []
        active = AnnotatedTextList()
        double = BR_SENTINEL + BR_SENTINEL
        for el in self:
            if BR_SENTINEL not in el.text:
                active.append(el)
                continue
            sub_texts = el.text.split(double)
            for i, text in enumerate(sub_texts):
                text = text.replace(BR_SENTINEL, "\n")
                text = _NL_SPACE_RE.sub("\n", text)
                sub_el = el.copy()
                sub_el.text = text
                active.append(sub_el)
                if i < len(sub_texts) - 1:
                    super_list.append(active)
                    active = AnnotatedTextList()
        if active:
            super_list.append(active)
        return super_list


class HtmlExtractor:
    """One-shot converter: ``HtmlExtractor().convert(html, name)`` -> Doc."""

    MAX_LEVELS = 10

    def __init__(self, add_title: bool = True, infer_furniture: bool = True):
        self.add_title = add_title
        self.infer_furniture = infer_furniture
        self._reset_state(None)

    def _reset_state(self, doc) -> None:
        self.doc = doc
        self.level = 0
        self.parents = {i: None for i in range(self.MAX_LEVELS)}
        self.content_layer = BODY
        self.hyperlink = None
        self.format_tags = []
        self.list_start_by_ref = {}
        self.list_ordered_by_ref = {}
        self._disable_inline_group_depth = 0

    # ------------------------------------------------------------------ API
    def convert(self, raw: Union[bytes, str], name: str = "file",
                filename: str = "", binary_hash: int = 0) -> Doc:
        dom = parse_html(raw)
        doc = Doc(name=name, filename=filename or name, binary_hash=binary_hash)
        self._reset_state(doc)

        # <title> as furniture
        title = dom.title_tag
        if title is not None and self.add_title:
            title_text = title.get_text(separator=" ", strip=True)
            doc.add_title(text=clean_unicode(title_text), orig=title_text,
                          content_layer=FURNITURE)

        # strip boilerplate - one walk for both removal classes (removal
        # is idempotent detachment, so nesting between the two classes
        # lands identically to two sequential walks)
        boiler = {"script", "noscript", "style"}
        for el in dom.find_all(
                pred=lambda e: e.name in boiler or "hidden" in e.attrs):
            el.decompose()

        self._fix_invalid_paragraph_structure(dom)

        content = dom.body or dom

        # <br> normalization via sentinel - one walk collecting both the
        # sentinel-bearing text nodes and the <br> elements
        brs = []
        for node in content.descendants():
            if node.__class__ is TextNode:
                if not node.is_comment and BR_SENTINEL in node.data:
                    node.data = node.data.replace(BR_SENTINEL, "")
            elif node.name == "br":
                brs.append(node)
        for br in brs:
            br.replace_with(TextNode(BR_SENTINEL))

        # furniture before first non-table heading (early-break scan)
        header = None
        for h in content.iter_elements():
            if h.name in _HEADING_NAMES and h.find_parent("table") is None:
                header = h
                break
        self.content_layer = (
            BODY if (not self.infer_furniture) or header is None else FURNITURE
        )

        self._walk(content)
        return doc

    # --------------------------------------------------------- DOM repair
    @staticmethod
    def _fix_invalid_paragraph_structure(dom: Document) -> None:
        """Emulate browser auto-closing of <p> containing block elements."""
        paragraphs = [
            p for p in dom.find_all("p")
            if p.find(PARA_BREAKERS) is not None
        ]
        for p in paragraphs:
            parent = p.parent
            if parent is None:
                continue
            new_nodes: list = []
            current_p: Optional[Element] = None

            def _start_para():
                nonlocal current_p
                if current_p is None:
                    current_p = Element("p")
                    new_nodes.append(current_p)

            def _flush_para_if_empty():
                nonlocal current_p
                if current_p is not None and not current_p.get_text(strip=True):
                    if current_p in new_nodes:
                        new_nodes.remove(current_p)
                current_p = None

            for node in list(p.contents):
                if isinstance(node, TextNode):
                    node.extract()
                    if node.is_comment:
                        continue
                    if node.data.strip():
                        _start_para()
                        current_p.append(TextNode(node.data))
                    continue
                node.extract()
                if node.name in PARA_BREAKERS:
                    _flush_para_if_empty()
                    new_nodes.append(node)
                else:
                    _start_para()
                    current_p.append(node)
            _flush_para_if_empty()

            siblings = parent.children
            try:
                idx = siblings.index(p)
            except ValueError:
                continue
            p.extract()
            for n in reversed(new_nodes):
                parent.insert(idx, n)

    # ------------------------------------------------------ tag predicates
    @staticmethod
    def _has_inline_hidden_style(tag: Element) -> bool:
        style = tag.get("style")
        if not isinstance(style, str) or not style.strip():
            return False
        normalized = _WS_ANY_RE.sub("", style.lower())
        if "display:none" in normalized:
            return True
        if "visibility:hidden" in normalized or "visibility:collapse" in normalized:
            return True
        if _OPACITY0_RE.search(normalized):
            return True
        return False

    def _is_suppressed_tag(self, tag: Element) -> bool:
        if not tag.attrs:
            return False
        if tag.has_attr("hidden"):
            return True
        aria_hidden = tag.get("aria-hidden")
        if isinstance(aria_hidden, str) and aria_hidden.strip().lower() in {
            "true", "1", "yes",
        }:
            return True
        return self._has_inline_hidden_style(tag)

    @staticmethod
    def _has_inline_display_style(tag: Element) -> bool:
        style = tag.get("style")
        if not isinstance(style, str):
            return False
        m = _DISPLAY_RE.search(style)
        if m is None:
            return False
        v = m.group(1).strip().lower()
        return v.startswith("inline") or v == "contents"

    def _should_buffer_tag_text_inline(self, tag: Element) -> bool:
        if tag.name in INLINE_HTML_TAGS:
            return True
        if tag.name == "div" and self._has_inline_display_style(tag):
            return True
        return False

    # checkboxes ------------------------------------------------------------
    @staticmethod
    def _is_input_checkbox_or_radio(tag: Element) -> bool:
        if tag.name != "input":
            return False
        return str(tag.get("type", "")).strip().lower() in {"checkbox", "radio"}

    @staticmethod
    def _is_custom_checkbox_tag(tag: Element) -> bool:
        return bool(tag.get_classes() & CUSTOM_CHECKBOX_CLASSES)

    def _is_checkbox_like_tag(self, tag: Element) -> bool:
        return self._is_input_checkbox_or_radio(tag) or self._is_custom_checkbox_tag(tag)

    def _has_direct_checkbox_like_child(self, tag: Element) -> bool:
        return any(
            self._is_checkbox_like_tag(c) for c in tag.find_all(recursive=False)
        )

    def _is_checkbox_label_container(self, tag: Element) -> bool:
        if not (tag.get_classes() & CHECKBOX_CONTAINER_CLASSES):
            return False
        return self._has_direct_checkbox_like_child(tag)

    def _is_checkbox_label_tag(self, tag: Element) -> bool:
        if self._is_checkbox_like_tag(tag):
            return False
        if "checkbox-label" in tag.get_classes():
            return True
        parent = tag.parent
        if parent is not None and self._is_checkbox_label_container(parent):
            return True
        return False

    @staticmethod
    def _normalize_checkbox_text(text: str) -> str:
        compact = _WS_ANY_RE.sub(" ", text).strip()
        if not compact:
            return ""
        if compact.lower() in CHECKBOX_MARK_TEXTS:
            return ""
        return clean_unicode(compact)

    def _is_checkbox_checked(self, tag: Element) -> bool:
        if self._is_input_checkbox_or_radio(tag):
            if tag.has_attr("checked"):
                return True
            return str(tag.get("aria-checked", "")).strip().lower() in {
                "true", "1", "yes", "on",
            }
        classes = tag.get_classes()
        if "checked" in classes:
            return True
        if str(tag.get("aria-checked", "")).strip().lower() in {"true", "1", "yes", "on"}:
            return True
        if str(tag.get("data-checked", "")).strip().lower() in {"true", "1", "yes", "on"}:
            return True
        text = _WS_ANY_RE.sub("", self.get_text(tag))
        return text.lower() in CHECKBOX_MARK_TEXTS

    def _checkbox_label_for_tag(self, tag: Element) -> Optional[str]:
        if not self._is_checkbox_like_tag(tag):
            return None
        return ("checkbox_selected" if self._is_checkbox_checked(tag)
                else "checkbox_unselected")

    def _extract_checkbox_text(self, checkbox: Element) -> str:
        parent = checkbox.parent
        labels: list[Element] = []
        seen: set[int] = set()

        def _add(label_tag: Element) -> None:
            if id(label_tag) in seen:
                return
            seen.add(id(label_tag))
            labels.append(label_tag)

        if checkbox.name == "input":
            input_id = checkbox.get("id")
            if input_id:
                root = checkbox
                for anc in checkbox.parents():
                    root = anc
                for label_tag in root.find_all("label"):
                    if label_tag.get("for") == input_id:
                        _add(label_tag)
            wrapping = checkbox.find_parent("label")
            if wrapping is not None:
                _add(wrapping)
            aria = checkbox.get("aria-labelledby")
            if isinstance(aria, str):
                root = checkbox
                for anc in checkbox.parents():
                    root = anc
                for ref_id in aria.split():
                    t = root.find(pred=lambda e, rid=ref_id: e.get("id") == rid)
                    if t is not None:
                        _add(t)
            texts = []
            for lt in labels:
                norm = self._normalize_checkbox_text(self.get_text(lt))
                if norm:
                    texts.append(norm)
            if texts:
                return " ".join(texts)

        if parent is not None:
            pclasses = parent.get_classes()
            if "checkbox-container" in pclasses:
                texts = []
                for sib in parent.find_all(recursive=False):
                    if sib is checkbox:
                        continue
                    if "checkbox-label" not in sib.get_classes():
                        continue
                    t = self._normalize_checkbox_text(self.get_text(sib))
                    if t:
                        texts.append(t)
                if texts:
                    return " ".join(texts)
            if pclasses & {"checkbox-item", "checkbox-option", "option"}:
                raw = self._text_excluding(parent, {id(checkbox)})
                t = self._normalize_checkbox_text(raw)
                if t:
                    return t

        if checkbox.name != "input":
            t = self._normalize_checkbox_text(self.get_text(checkbox))
            if t:
                return t
        return ""

    @staticmethod
    def _text_excluding(tag: Element, excluded: set[int]) -> str:
        def _extract(node) -> list[str]:
            if isinstance(node, TextNode):
                return [] if node.is_comment else [node.data]
            if id(node) in excluded:
                return []
            parts: list[str] = []
            for child in node.contents:
                parts.extend(_extract(child))
            if node.name in {"p", "li", "div", "label", "span", "td", "th"}:
                parts.append(" ")
            return parts
        return "".join(_extract(tag))

    # ------------------------------------------------------- text helpers
    @staticmethod
    def get_text(item) -> str:
        """Concat descendants' text; p/li/th/td add a trailing space
        (reference get_text, html_backend.py:4536-4566)."""
        def _rec(node) -> list[str]:
            if isinstance(node, TextNode):
                if node.is_comment:
                    return []
                return [node.data.replace(BR_SENTINEL, "\n")]
            parts: list[str] = []
            for child in node.contents:
                parts.extend(_rec(child))
            joined = "".join(parts)
            return [joined + " " if node.name in {"p", "li", "th", "td"} else joined]
        return "".join(_rec(item))

    @staticmethod
    def _get_cell_spans(cell: Element) -> tuple[int, int]:
        def _num(s: str) -> int:
            if s and s[0].isnumeric():
                m = _DIGITS_RE.search(s)
                if m:
                    return int(m.group())
            return 1
        return (_num(str(cell.get("colspan", "1"))),
                _num(str(cell.get("rowspan", "1"))))

    @property
    def _formatting(self) -> Optional[Formatting]:
        kwargs: dict = {}
        for t in self.format_tags:
            kwargs.update(FORMAT_TAG_MAP[t])
        if not kwargs:
            return None
        return Formatting(**kwargs)

    @contextmanager
    def _use_format(self, tags: list[str]):
        if not tags:
            yield
        else:
            self.format_tags.extend(tags)
            try:
                yield
            finally:
                self.format_tags = self.format_tags[: -len(tags)]

    @contextmanager
    def _use_hyperlink(self, tag: Element):
        href = tag.get("href")
        if href is None or not isinstance(href, str) or not href:
            yield
            return
        old = self.hyperlink
        self.hyperlink = normalize_hyperlink(href)
        try:
            yield
        finally:
            self.hyperlink = old

    def _collect_parent_format_tags(self, item) -> list[str]:
        # one ancestor walk, then FORMAT_TAG_MAP iteration order (the
        # per-format walk was O(formats x depth))
        anc_names = set()
        anc = item.parent
        while anc is not None:
            anc_names.add(anc.name)
            anc = anc.parent
        return [fmt for fmt in FORMAT_TAG_MAP if fmt in anc_names]

    def _extract_annotated(
        self,
        item,
        ignore_list: bool = False,
        find_parent_annotation: bool = False,
        keep_newlines: bool = False,
    ) -> AnnotatedTextList:
        """Reference ``_extract_text_and_hyperlink_recursively``."""
        if find_parent_annotation:
            fmt_tags = self._collect_parent_format_tags(item)
            anc = item.parent
            while anc is not None:
                if anc.name == "a" and anc.get("href"):
                    with self._use_format(fmt_tags):
                        with self._use_hyperlink(anc):
                            return self._extract_annotated(
                                item, ignore_list, keep_newlines=keep_newlines
                            )
                anc = anc.parent

        if isinstance(item, TextNode):
            if item.is_comment:
                return AnnotatedTextList()
            parent = item.parent
            if parent is not None:
                if self._is_suppressed_tag(parent):
                    return AnnotatedTextList()
                if self._is_checkbox_label_container(parent):
                    return AnnotatedTextList()
            if keep_newlines:
                text = item.data.strip()
            else:
                # join(split()) collapses ALL whitespace runs (incl \n\r)
                # to single spaces
                text = " ".join(item.data.split())
            if text:
                code = any(ct in self.format_tags for ct in CODE_TAGS)
                return AnnotatedTextList([
                    AnnotatedText(text, self.hyperlink, self._formatting, code)
                ])
            if keep_newlines and item.data.strip("\n\r") == "":
                code = any(ct in self.format_tags for ct in CODE_TAGS)
                return AnnotatedTextList([
                    AnnotatedText("\n", self.hyperlink, self._formatting, code)
                ])
            return AnnotatedTextList()

        tag = item
        if self._is_suppressed_tag(tag):
            return AnnotatedTextList()
        if self._is_checkbox_like_tag(tag):
            return AnnotatedTextList()
        if self._is_checkbox_label_tag(tag):
            return AnnotatedTextList()
        result = AnnotatedTextList()
        if not ignore_list or (tag.name not in ("ul", "ol", "dl", "table")):
            for child in tag.contents:
                if isinstance(child, Element) and child.name in FORMAT_TAG_MAP:
                    with self._use_format([child.name]):
                        result.extend(self._extract_annotated(
                            child, ignore_list, keep_newlines=keep_newlines))
                elif isinstance(child, Element) and child.name == "a":
                    with self._use_hyperlink(child):
                        result.extend(self._extract_annotated(
                            child, ignore_list, keep_newlines=keep_newlines))
                else:
                    result.extend(self._extract_annotated(
                        child, ignore_list, keep_newlines=keep_newlines))
        return result

    # ------------------------------------------------------ group contexts
    def _should_create_inline_group(self, parts: AnnotatedTextList) -> bool:
        return len(parts) > 1

    @contextmanager
    def _use_inline_group(self, parts: AnnotatedTextList, force: bool = False
                          ) -> Iterator[Optional[str]]:
        if self._disable_inline_group_depth > 0:
            yield None
            return
        if not force and not self._should_create_inline_group(parts):
            yield None
            return
        inline = self.doc.add_inline_group(
            parent=self.parents[self.level], content_layer=self.content_layer
        )
        self.parents[self.level + 1] = inline
        self.level += 1
        try:
            yield inline.self_ref
        finally:
            self.parents[self.level] = None
            self.level -= 1

    @contextmanager
    def _use_section_group(self, name: str, furniture: bool = False):
        old_layer = self.content_layer
        if furniture:
            self.content_layer = FURNITURE
        self.parents[self.level + 1] = self.doc.add_group(
            name=name, label="section", parent=self.parents[self.level],
            content_layer=self.content_layer,
        )
        self.level += 1
        try:
            yield
        finally:
            self.parents[self.level + 1] = None
            self.level -= 1
            self.content_layer = old_layer

    @contextmanager
    def _use_table_cell_context(self):
        original_level = self.level
        original_parents = self.parents.copy()
        try:
            yield
        finally:
            self.level = original_level
            self.parents = original_parents

    @contextmanager
    def _use_list_item_context(self, parent_item):
        if parent_item:
            self.parents[self.level + 1] = parent_item
            self.level += 1
            try:
                yield
            finally:
                self.parents[self.level + 1] = None
                self.level -= 1
        else:
            yield

    def _has_block_descendants(self, node: Element) -> bool:
        """Single early-exit subtree scan for block tags / inputs / custom
        checkboxes (replaces three separate find() passes in the hot path)."""
        stack = [node.children]
        while stack:
            for child in stack.pop():
                if isinstance(child, Element):
                    if (child.name in BLOCK_TAGS or child.name == "input"
                            or (child.attrs.get("class")
                                and self._is_custom_checkbox_tag(child))):
                        return True
                    if child.children:
                        stack.append(child.children)
        return False

    # --------------------------------------------------------------- walk
    def _walk(self, element: Element) -> list[str]:
        doc = self.doc
        added_refs: list[str] = []
        buffer = AnnotatedTextList()

        def _flush_buffer() -> None:
            if not buffer:
                return
            annotated = buffer.simplify()
            parts = annotated.split_by_newline()
            buffer.clear()
            if not "".join(el.text for el in annotated):
                return
            for part in parts:
                force_inline = (
                    len(part) == 1 and bool(part[0].code)
                    and element.name not in {"p", "pre"}
                )
                with self._use_inline_group(part, force=force_inline) as inline_ref:
                    for at in part:
                        if at.text.strip():
                            seg_clean = clean_unicode(at.text.strip())
                            if at.code:
                                item = doc.add_code(
                                    parent=self.parents[self.level],
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            else:
                                item = doc.add_text(
                                    parent=self.parents[self.level],
                                    label="text",
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            if inline_ref is None:
                                added_refs.append(item.self_ref)
                    if inline_ref is not None:
                        added_refs.append(inline_ref)

        for node in list(element.contents):
            if isinstance(node, Element):
                name = node.name
                if self._is_suppressed_tag(node):
                    continue
                has_block_descendants = self._has_block_descendants(node)
                if self._is_form_container(node):
                    _flush_buffer()
                    added_refs.extend(self._handle_form_container(node))
                    continue
                if self._is_custom_checkbox_tag(node):
                    _flush_buffer()
                    ref = self._emit_custom_checkbox(node)
                    if ref is not None:
                        added_refs.append(ref)
                    continue
                if name == "img":
                    _flush_buffer()
                    ref = self._emit_image(node)
                    if ref:
                        added_refs.append(ref)
                elif name == "input":
                    _flush_buffer()
                    ref = self._emit_input(node)
                    if ref:
                        added_refs.append(ref)
                elif name in FORMAT_TAG_MAP:
                    if has_block_descendants:
                        _flush_buffer()
                        with self._use_format([name]):
                            added_refs.extend(self._walk(node))
                    else:
                        with self._use_format([name]):
                            buffer.extend(self._extract_annotated(
                                node, find_parent_annotation=True,
                                keep_newlines=False))
                elif name == "a":
                    if has_block_descendants:
                        _flush_buffer()
                        with self._use_hyperlink(node):
                            added_refs.extend(self._walk(node))
                    else:
                        with self._use_hyperlink(node):
                            buffer.extend(self._extract_annotated(
                                node, find_parent_annotation=True,
                                keep_newlines=False))
                elif name in BLOCK_TAGS:
                    _flush_buffer()
                    added_refs.extend(self._handle_block(node))
                elif has_block_descendants:
                    _flush_buffer()
                    added_refs.extend(self._walk(node))
                elif self._should_buffer_tag_text_inline(node):
                    buffer.extend(self._extract_annotated(
                        node, find_parent_annotation=True, keep_newlines=False))
                else:
                    _flush_buffer()
                    added_refs.extend(self._walk(node))
            elif isinstance(node, TextNode):
                if node.is_comment:
                    continue
                node_text = node.data
                if node_text.strip("\n\r") == "":
                    parent_tag = node.parent
                    if (parent_tag is not None
                            and parent_tag.name in {"td", "th"}
                            and "\n" in node_text):
                        _flush_buffer()
                    continue
                buffer.extend(self._extract_annotated(
                    node, find_parent_annotation=True, keep_newlines=False))

        _flush_buffer()
        return added_refs

    # ---------------------------------------------------------- form KV
    @staticmethod
    def _is_form_container(tag: Element) -> bool:
        return FORM_CONTAINER_CLASS in tag.get_classes()

    @staticmethod
    def _normalize_form_text(text: str) -> tuple:
        raw = _WS_ANY_RE.sub(" ", text).strip()
        return raw, clean_unicode(raw)

    def _extract_form_value_text(self, value_tag: Element) -> str:
        if value_tag.name == "input":
            for attr in ("value", "placeholder", "name"):
                val = value_tag.get(attr)
                if isinstance(val, str) and val.strip():
                    return val.strip()
            return ""
        if value_tag.name == "textarea":
            return self.get_text(value_tag).strip()
        if value_tag.name == "select":
            selected = None
            for option in value_tag.find_all("option"):
                if option.has_attr("selected"):
                    selected = option
                    break
            if selected is None:
                selected = value_tag.find("option")
            if selected is not None:
                t = self.get_text(selected).strip()
                if t:
                    return t
                v = selected.get("value")
                if isinstance(v, str) and v.strip():
                    return v.strip()
            return ""
        return self.get_text(value_tag)

    def _handle_form_container(self, container: Element) -> list[str]:
        """Key/value form regions: ``form_region`` class + ``keyN`` /
        ``keyN_marker`` / ``keyN_valueM`` id conventions
        (html_backend.py:3827+, FIXTURES.md kvp family)."""
        doc = self.doc
        fields: dict = {}
        order = 0
        for el in container.iter_elements():
            el_id = el.get("id")
            if not isinstance(el_id, str) or not el_id:
                continue
            order += 1
            m = _FORM_MARKER_ID_RE.match(el_id)
            if m:
                f = fields.setdefault(m.group("key_id"),
                                      {"order": order, "marker": None,
                                       "key": None, "values": []})
                f["marker"] = el
                f["order"] = min(f["order"], order)
                continue
            m = _FORM_VALUE_ID_RE.match(el_id)
            if m:
                f = fields.setdefault(m.group("key_id"),
                                      {"order": order, "marker": None,
                                       "key": None, "values": []})
                f["values"].append((order, el))
                continue
            m = _FORM_KEY_ID_RE.match(el_id)
            if m:
                f = fields.setdefault(m.group("key_id"),
                                      {"order": order, "marker": None,
                                       "key": None, "values": []})
                f["key"] = el
                f["order"] = min(f["order"], order)
        if not fields:
            # no key/value ids: table-form containers parse as tables,
            # anything else falls back to a plain walk
            if container.name == "table":
                return self._handle_block(container)
            return self._walk(container)

        region = doc.add_field_region(parent=self.parents[self.level],
                                      content_layer=self.content_layer)
        for key_id in sorted(fields, key=lambda k: fields[k]["order"]):
            f = fields[key_id]
            item = doc.add_field_item(parent=region,
                                      content_layer=self.content_layer)
            if f["marker"] is not None:
                raw, clean = self._normalize_form_text(
                    self.get_text(f["marker"]))
                if clean:
                    doc.add_text(label="marker", text=clean, orig=raw,
                                 parent=item,
                                 content_layer=self.content_layer)
            if f["key"] is not None:
                raw, clean = self._normalize_form_text(
                    self.get_text(f["key"]))
                if clean:
                    doc.add_text(label="field_key", text=clean, orig=raw,
                                 parent=item,
                                 content_layer=self.content_layer)
            for _, vtag in sorted(f["values"], key=lambda t: t[0]):
                raw, clean = self._normalize_form_text(
                    self._extract_form_value_text(vtag))
                if clean:
                    kind = ("fillable"
                            if vtag.name in {"input", "textarea", "select"}
                            else "read_only")
                    doc.add_text(label="field_value", text=clean, orig=raw,
                                 parent=item, kind=kind,
                                 content_layer=self.content_layer)
        return [region.self_ref]

    # ------------------------------------------------------------- blocks
    def _handle_block(self, tag: Element) -> list[str]:
        doc = self.doc
        added_refs: list[str] = []
        name = tag.name

        if name == "figure":
            img_tag = tag.find("img")
            if img_tag is not None:
                ref = self._emit_image(img_tag)
                if ref is not None:
                    added_refs.append(ref)

        elif name in _HEADING_NAMES:
            added_refs.extend(self._handle_heading(tag))

        elif name in {"ul", "ol", "dl"}:
            added_refs.append(self._handle_list(tag))

        elif name in {"p", "address", "summary"}:
            text_list = self._extract_annotated(tag, find_parent_annotation=True)
            annotated = text_list.simplify()
            for part in annotated.split_by_newline():
                with self._use_inline_group(part) as inline_ref:
                    for at in part:
                        seg = at.text.strip()
                        if seg:
                            seg_clean = clean_unicode(seg)
                            if at.code:
                                item = doc.add_code(
                                    parent=self.parents[self.level],
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            else:
                                item = doc.add_text(
                                    parent=self.parents[self.level],
                                    label="text",
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            if inline_ref is None:
                                added_refs.append(item.self_ref)
                    if inline_ref is not None:
                        added_refs.append(inline_ref)
            # one subtree walk classifying into the three emit groups
            # (same grouped document-order processing as three find_alls)
            imgs: list = []
            inputs: list = []
            cbs: list = []
            for el in tag.find_all():
                if el.name == "img":
                    imgs.append(el)
                if el.name == "input":
                    inputs.append(el)
                if self._is_custom_checkbox_tag(el):
                    cbs.append(el)
            for img_tag in imgs:
                self._emit_image(img_tag)
            for input_tag in inputs:
                ref = self._emit_input(input_tag)
                if ref is not None:
                    added_refs.append(ref)
            for cb in cbs:
                ref = self._emit_custom_checkbox(cb)
                if ref is not None:
                    added_refs.append(ref)

        elif name == "table":
            num_rows, num_cols = self.get_html_table_row_col(tag)
            data = TableData(num_rows=num_rows, num_cols=num_cols)
            docling_table = doc.add_table(
                data=data, parent=self.parents[self.level],
                content_layer=self.content_layer,
            )
            added_refs.append(docling_table.self_ref)
            self.parse_table_data(tag, docling_table, num_rows, num_cols)

        elif name in {"stamp", "signature"}:
            placeholder = doc.add_picture(
                parent=self.parents[self.level],
                content_layer=self.content_layer,
            )
            placeholder.meta = {
                "classification": {
                    "predictions": [{"class_name": name}],
                },
            }
            text = clean_unicode(self.get_text(tag).strip())
            doc.add_text(label="text", text=text, parent=placeholder)

        elif name == "pre":
            text_list = self._extract_annotated(
                tag, find_parent_annotation=True, keep_newlines=True)
            annotated = text_list.simplify()
            hint = self._code_language_hint(tag)
            inline_ref = None
            with self._use_inline_group(annotated) as inline_ref:
                for at in annotated:
                    text_clean = clean_unicode(at.text.strip())
                    item = self.doc.add_code(
                        parent=self.parents[self.level],
                        text=text_clean,
                        code_language=detect_code_language(text_clean, hint=hint),
                        content_layer=self.content_layer,
                        formatting=at.formatting,
                        hyperlink=at.hyperlink,
                    )
                    if inline_ref is None:
                        added_refs.append(item.self_ref)
            if inline_ref is not None:
                added_refs.append(inline_ref)

        elif name == "footer":
            with self._use_section_group("footer", furniture=True):
                self._walk(tag)

        elif name == "details":
            with self._use_section_group("details"):
                self._walk(tag)

        return added_refs

    @staticmethod
    def _code_language_hint(tag: Element) -> Optional[str]:
        tokens: set[str] = set(tag.get_classes())
        for el in tag.find_all("code"):
            tokens |= el.get_classes()
        prefixed = sorted(t for t in tokens if t.lower().startswith(HINT_PREFIXES))
        bare = sorted(tokens - set(prefixed))
        for token in (*prefixed, *bare):
            if normalize_code_language(token) is not None:
                return token
        return None

    # ------------------------------------------------------------ headings
    def _handle_heading(self, tag: Element) -> list[str]:
        doc = self.doc
        added_ref: list[str] = []
        self.content_layer = BODY
        level = int(tag.name[1])
        parts = self._extract_annotated(tag, find_parent_annotation=True)
        at = parts.to_single_text_element()
        text_clean = clean_unicode(at.text)
        if level == 1:
            for key in self.parents:
                self.parents[key] = None
            self.level = 0
            title = doc.add_title(
                text_clean, content_layer=self.content_layer,
                formatting=at.formatting, hyperlink=at.hyperlink,
            )
            self.parents[self.level + 1] = title
            added_ref = [title.self_ref]
        else:
            level -= 1
            if level > self.level:
                for i in range(self.level, level):
                    self.parents[i + 1] = doc.add_group(
                        name=f"header-{i + 1}", label="section",
                        parent=self.parents[i],
                        content_layer=self.content_layer,
                    )
                self.level = level
            elif level < self.level:
                for key in self.parents:
                    if key > level + 1:
                        self.parents[key] = None
                self.level = level
            heading = doc.add_heading(
                parent=self.parents[self.level],
                text=text_clean,
                orig=at.text,
                level=self.level,
                content_layer=self.content_layer,
                formatting=at.formatting,
                hyperlink=at.hyperlink,
            )
            self.parents[self.level + 1] = heading
            added_ref = [heading.self_ref]
        self.level += 1
        for img_tag in tag.find_all("img"):
            ref = self._emit_image(img_tag)
            if ref:
                added_ref.append(ref)
        return added_ref

    # --------------------------------------------------------------- lists
    def _has_list_ancestor(self, elem: Element, boundary: Element) -> bool:
        parent = elem.parent
        while parent is not None and parent is not boundary:
            if parent.name in {"ul", "ol", "dl"}:
                return True
            parent = parent.parent
        return False

    def _process_nested_element(self, elem, li: Element, processed: set) -> None:
        if id(elem) in processed:
            return
        processed.add(id(elem))
        if isinstance(elem, Element):
            if elem.name == "img":
                self._emit_image(elem)
            elif elem.name in {"ul", "ol", "dl"}:
                if not self._has_list_ancestor(elem, li):
                    self._handle_block(elem)
                    self.parents[self.level + 1] = None
            elif elem.name == "table":
                self._handle_block(elem)
                self.parents[self.level + 1] = None
            else:
                for child in elem.contents:
                    self._process_nested_element(child, li, processed)

    def _process_list_item_nested_content(self, li: Element, processed: set) -> None:
        for child in li.contents:
            self._process_nested_element(child, li, processed)

    def _add_list_item_with_content(
        self, tag: Element, parent, enumerated: bool = False,
        marker: str = "", extra_bold: bool = False,
    ):
        doc = self.doc
        parts = self._extract_annotated(
            tag, ignore_list=True, find_parent_annotation=True)
        min_parts = parts.simplify()
        item_text = _WS_RE.sub(" ", "".join(el.text for el in min_parts)).strip()
        if not item_text:
            return None

        if len(min_parts) > 1:
            list_item = doc.add_list_item(
                text="", enumerated=enumerated, marker=marker, parent=parent,
                content_layer=self.content_layer,
            )
            self.parents[self.level + 1] = list_item
            self.level += 1
            with self._use_inline_group(min_parts):
                for at in min_parts:
                    text_part = _WS_RE.sub(" ", at.text).strip()
                    clean_text = clean_unicode(text_part)
                    formatting = at.formatting
                    if extra_bold:
                        formatting = (formatting.copy() if formatting
                                      else Formatting())
                        formatting.bold = True
                    if at.code:
                        doc.add_code(
                            parent=self.parents[self.level], text=clean_text,
                            content_layer=self.content_layer,
                            formatting=formatting, hyperlink=at.hyperlink,
                        )
                    else:
                        doc.add_text(
                            parent=self.parents[self.level], label="text",
                            text=clean_text,
                            content_layer=self.content_layer,
                            formatting=formatting, hyperlink=at.hyperlink,
                        )
            self.parents[self.level] = None
            self.level -= 1
            return list_item
        else:
            at = min_parts[0]
            text = _WS_RE.sub(" ", at.text).strip()
            clean_text = clean_unicode(text)
            formatting = at.formatting
            if extra_bold:
                formatting = formatting.copy() if formatting else Formatting()
                formatting.bold = True
            return doc.add_list_item(
                text=clean_text, enumerated=enumerated, marker=marker,
                orig=text, parent=parent, content_layer=self.content_layer,
                formatting=formatting, hyperlink=at.hyperlink,
            )

    def _handle_list(self, tag: Element) -> str:
        doc = self.doc
        tag_name = tag.name
        start: Optional[int] = None
        is_ordered = tag_name == "ol"
        is_description = tag_name == "dl"
        if is_description:
            list_name = "description list"
        elif is_ordered:
            start_attr = tag.get("start")
            if isinstance(start_attr, str) and start_attr.isnumeric():
                start = int(start_attr)
            list_name = "ordered list" + (
                f" start {start}" if start is not None else "")
        else:
            list_name = "list"

        list_group = doc.add_list_group(
            name=list_name, parent=self.parents[self.level],
            content_layer=self.content_layer,
        )
        self.parents[self.level + 1] = list_group
        self.list_ordered_by_ref[list_group.self_ref] = is_ordered
        if is_ordered and start is not None:
            self.list_start_by_ref[list_group.self_ref] = start
        self.level += 1

        counter = 0

        if is_description:
            current_dt_item = None
            dd_group = None
            for child in tag.find_all(["dt", "dd"], recursive=False):
                cname = child.name
                if cname == "dt":
                    dd_group = None
                    current_dt_item = self._add_list_item_with_content(
                        tag=child, parent=list_group, extra_bold=True)
                    if current_dt_item:
                        self.parents[self.level + 1] = current_dt_item
                elif cname == "dd":
                    has_nested_dl = child.find("dl", recursive=False) is not None
                    if has_nested_dl:
                        dd_group = None
                        if current_dt_item:
                            with self._use_list_item_context(current_dt_item):
                                self._process_list_item_nested_content(child, set())
                    else:
                        if dd_group is None and current_dt_item:
                            dd_group = doc.add_list_group(
                                name="descriptions", parent=current_dt_item,
                                content_layer=self.content_layer,
                            )
                        dd_parent = dd_group or list_group
                        dd_item = self._add_list_item_with_content(
                            tag=child, parent=dd_parent)
                        content_parent = dd_item or dd_parent
                        with self._use_list_item_context(content_parent):
                            self._process_list_item_nested_content(child, set())
            self.parents[self.level + 1] = None
            self.level -= 1
            return list_group.self_ref

        for li in tag.find_all(["li", "ul", "ol"], recursive=False):
            if li.name in {"ul", "ol"}:
                # invalid-but-common direct sub-list
                self._handle_block(li)
            else:
                marker = (f"{start + counter}."
                          if is_ordered and start is not None else "")
                inputs_in_li = [
                    t for t in li.find_all("input")
                    if t.find_parent("li") is li
                ]
                checkboxes_in_li = [
                    t for t in li.find_all(pred=self._is_custom_checkbox_tag)
                    if t.find_parent("li") is li
                ]
                list_item = self._add_list_item_with_content(
                    tag=li, parent=list_group,
                    enumerated=is_ordered, marker=marker,
                )
                if list_item:
                    counter += 1
                if list_item or inputs_in_li or checkboxes_in_li:
                    with self._use_list_item_context(list_item):
                        for t in inputs_in_li:
                            self._emit_input(t)
                        for t in checkboxes_in_li:
                            self._emit_custom_checkbox(t)
                        self._process_list_item_nested_content(li, set())
                else:
                    for sublist in li.find_all(["ul", "ol", "dl"]):
                        if not self._has_list_ancestor(sublist, li):
                            self._handle_block(sublist)

        self.parents[self.level + 1] = None
        self.level -= 1
        return list_group.self_ref

    # --------------------------------------------------------------- table
    @classmethod
    def get_html_table_row_col(cls, tag: Element) -> tuple[int, int]:
        for t in tag.find_all(["thead", "tbody"], recursive=False):
            t.unwrap()
        num_rows = 0
        num_cols = 0
        for row in tag.find_all("tr", recursive=False):
            col_count = 0
            is_row_header = True
            for cell in row.find_all(["td", "th"], recursive=False):
                col_span, row_span = cls._get_cell_spans(cell)
                col_count += col_span
                if cell.name == "td" or row_span == 1:
                    is_row_header = False
            num_cols = max(num_cols, col_count)
            if not is_row_header:
                num_rows += 1
        return num_rows, num_cols

    def parse_table_data(self, element: Element, docling_table,
                         num_rows: int, num_cols: int) -> None:
        doc = self.doc
        for t in element.find_all(["thead", "tbody"], recursive=False):
            t.unwrap()
        grid: list[list] = [[None] * num_cols for _ in range(num_rows)]
        start_row_span = 0
        row_idx = -1

        for row in element.find_all("tr", recursive=False):
            row_classes = {c.lower() for c in row.get_classes()}
            row_is_section = "row_section" in row_classes
            cells = row.find_all(["td", "th"], recursive=False)
            col_header = True
            row_header = True
            for html_cell in cells:
                _, row_span = self._get_cell_spans(html_cell)
                if html_cell.name == "td":
                    col_header = False
                    row_header = False
                elif row_span == 1:
                    row_header = False
            if not row_header:
                row_idx += 1
                start_row_span = 0
            else:
                start_row_span += 1

            col_idx = 0
            for html_cell in cells:
                cell_classes = {c.lower() for c in html_cell.get_classes()}
                row_section = row_is_section or ("row_section" in cell_classes)

                # inline formulas: keep $$...$$ payload as text
                for formula in html_cell.find_all("inline-formula"):
                    fx = self.get_text(formula)
                    math_parts = fx.split("$$")
                    if len(math_parts) == 3:
                        formula.replace_with(TextNode(f"$${math_parts[1]}$$"))

                provs_in_cell: list[str] = []
                rich = self._is_rich_table_cell(html_cell)
                ref_for_rich_cell = None
                if rich:
                    with self._use_table_cell_context():
                        provs_in_cell = self._walk(html_cell)
                    group_name = (
                        f"rich_cell_group_{len(doc.tables)}_{col_idx}_"
                        f"{start_row_span + row_idx}"
                    )
                    if len(provs_in_cell) >= 1:
                        group = doc.add_group(
                            label="unspecified", name=group_name,
                            parent=docling_table,
                        )
                        for ref in provs_in_cell:
                            item = doc.resolve(ref)
                            old_parent = doc.resolve(item.parent_ref)
                            if ref in old_parent.children:
                                old_parent.children.remove(ref)
                            item.parent_ref = group.self_ref
                            group.children.append(ref)
                        ref_for_rich_cell = group.self_ref
                    else:
                        rich = False

                text = clean_unicode(self.get_text(html_cell).strip())
                col_span, row_span = self._get_cell_spans(html_cell)
                if row_header:
                    row_span -= 1
                while (col_idx < num_cols
                       and grid[row_idx + start_row_span][col_idx] is not None):
                    col_idx += 1
                for r in range(start_row_span, start_row_span + row_span):
                    for c in range(col_span):
                        if row_idx + r < num_rows and col_idx + c < num_cols:
                            grid[row_idx + r][col_idx + c] = text

                doc.add_table_cell(docling_table, TableCell(
                    text=text,
                    row_span=row_span,
                    col_span=col_span,
                    start_row_offset_idx=start_row_span + row_idx,
                    end_row_offset_idx=start_row_span + row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=col_header,
                    row_header=((not col_header) and html_cell.name == "th"),
                    row_section=row_section,
                    ref=ref_for_rich_cell,
                ))

    def _is_rich_table_cell(self, table_cell: Element) -> bool:
        children = table_cell.find_all(recursive=True)
        has_input = any(c.name == "input" for c in children)
        has_custom_checkbox = any(
            self._is_custom_checkbox_tag(c) for c in children)
        has_line_break = any(c.name == "br" for c in children)
        direct_block_children = [
            c for c in table_cell.find_all(recursive=False)
            if c.name in {"p", "div", "li"}
        ]
        if has_line_break or len(direct_block_children) > 1:
            return True
        if not children:
            content = [n for n in table_cell.contents
                       if isinstance(n, TextNode) and not n.is_comment]
            return len(content) > 1
        annotations = self._extract_annotated(
            table_cell, find_parent_annotation=True)
        if not annotations:
            return bool([c for c in children if c.name in {"img", "input"}])
        if len(annotations) == 1:
            at = annotations[0]
            return (bool(at.formatting) or bool(at.hyperlink) or at.code
                    or has_input or has_custom_checkbox)
        return True

    # --------------------------------------------------------- leaf emits
    def _emit_image(self, img_tag: Element) -> Optional[str]:
        doc = self.doc
        figure = img_tag.find_parent("figure")
        caption = AnnotatedTextList()
        parent = self.parents[self.level]

        img_hyperlink = None
        anc = img_tag.parent
        while anc is not None:
            if anc.name == "a" and anc.get("href"):
                img_hyperlink = normalize_hyperlink(anc.get("href"))
                break
            anc = anc.parent
        if img_hyperlink:
            img_text = img_tag.get("alt") or ""
            caption.append(AnnotatedText(img_text, hyperlink=img_hyperlink))

        if figure is not None:
            caption_tag = figure.find("figcaption", recursive=False)
            if caption_tag is not None:
                caption = self._extract_annotated(
                    caption_tag, find_parent_annotation=True)
        if not caption and img_tag.get("alt"):
            caption = AnnotatedTextList([AnnotatedText(img_tag.get("alt"))])

        caption_at = caption.to_single_text_element()
        caption_item = None
        if caption_at.text:
            caption_item = doc.add_text(
                label="caption",
                text=clean_unicode(caption_at.text.strip()),
                orig=caption_at.text,
                content_layer=self.content_layer,
                formatting=caption_at.formatting,
                hyperlink=caption_at.hyperlink,
            )
        placeholder = doc.add_picture(
            caption=caption_item, parent=parent,
            content_layer=self.content_layer,
        )
        return placeholder.self_ref

    def _emit_input(self, input_tag: Element) -> Optional[str]:
        if self._is_suppressed_tag(input_tag):
            return None
        input_type = str(input_tag.get("type", "")).lower()
        if input_type == "hidden":
            return None
        label = "text"
        checkbox_label = self._checkbox_label_for_tag(input_tag)
        if checkbox_label is not None:
            label = checkbox_label
            text_clean = self._extract_checkbox_text(input_tag)
        else:
            text = str(input_tag.get("value") or "").strip()
            if not text:
                text = str(input_tag.get("placeholder") or "").strip()
            if not text:
                text = str(input_tag.get("name") or "").strip()
            text_clean = clean_unicode(text) if text else ""
        item = self.doc.add_text(
            parent=self.parents[self.level],
            label=label,
            text=text_clean,
            content_layer=self.content_layer,
            formatting=self._formatting,
            hyperlink=self.hyperlink,
        )
        return item.self_ref

    def _emit_custom_checkbox(self, checkbox_tag: Element) -> Optional[str]:
        if self._is_suppressed_tag(checkbox_tag):
            return None
        checkbox_label = self._checkbox_label_for_tag(checkbox_tag)
        if checkbox_label is None:
            return None
        text = self._extract_checkbox_text(checkbox_tag)
        item = self.doc.add_text(
            parent=self.parents[self.level],
            label=checkbox_label,
            text=text,
            content_layer=self.content_layer,
        )
        return item.self_ref


def extract(raw: Union[bytes, str], name: str = "file",
            filename: str = "", binary_hash: int = 0) -> Doc:
    """Convenience wrapper: parse + walk + return the document model."""
    return HtmlExtractor().convert(raw, name=name, filename=filename,
                                   binary_hash=binary_hash)
