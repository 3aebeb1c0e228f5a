"""JATS (Journal Article Tag Suite) XML backend on stdlib ElementTree.

Reimplements the semantics of the reference's JATS backend
(``/root/reference/docling/backend/xml/jats_backend.py``) without
lxml/bs4:

- metadata head: title from the title-groups (joined with " - "),
  authors + de-duplicated affiliations as paragraphs, abstracts as
  "Abstract" sections.
- linear body/back walk: sections/acknowledgments become headings with a
  running level; paragraphs accumulate inline runs (bold/italic/
  underline/strike/sub/sup formatting merged through the tag stack,
  adjacent equal-format runs coalesced) and emit one text item or an
  inline group; lists/list-items (nested lists re-walked under the
  item), figures as caption+picture, table-wraps as caption+grid tables
  (with colspan/rowspan and th/td header semantics), footnote groups as
  list groups, reference lists as list groups of flattened citations
  (element-citation field order: authors. title. source. loc: publisher.
  volume:page. (year). IDS), display and inline TeX formulas.

Entity handling: undefined named entities from the JATS DTDs are
resolved via ``html.entities`` before parsing (stdlib expat has no DTD).
"""

from __future__ import annotations

import re
from html.entities import html5
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from .model import BODY, Doc, Formatting, TableCell, TableData

DEFAULT_HEADER_ACKNOWLEDGMENTS = "Acknowledgments"
DEFAULT_HEADER_ABSTRACT = "Abstract"
DEFAULT_HEADER_FOOTNOTES = "Footnotes"
DEFAULT_HEADER_REFERENCES = "References"
DEFAULT_TEXT_ETAL = "et al."

_FORMAT_TAG_MAP = {
    "bold": {"bold": True},
    "italic": {"italic": True},
    "underline": {"underline": True},
    "strike": {"strikethrough": True},
    "sub": {"script": "sub"},
    "sup": {"script": "super"},
}

_JATS_DTD_HINTS = (b"JATS-journalpublishing", b"JATS-archive")


def looks_like_jats(raw: bytes) -> bool:
    head = raw[:4096]
    return any(h in head for h in _JATS_DTD_HINTS)


_ENTITY_RE = re.compile(rb"&([A-Za-z][A-Za-z0-9.]*);")
_DOCTYPE_RE = re.compile(rb"<!DOCTYPE[^\[>]*(\[[^\]]*\])?[^>]*>", re.S)


def _resolve_entities(raw: bytes) -> bytes:
    """Expand internal-DTD and HTML named entities; drop the DOCTYPE so
    stdlib expat can parse without a resolver."""
    custom: dict[bytes, bytes] = {}
    m = _DOCTYPE_RE.search(raw)
    if m and m.group(1):
        for ent in re.finditer(
                rb'<!ENTITY\s+(\S+)\s+"([^"]*)"', m.group(1)):
            custom[ent.group(1)] = ent.group(2)
    raw = _DOCTYPE_RE.sub(b"", raw, count=1)

    def sub(match):
        name = match.group(1)
        if name in (b"amp", b"lt", b"gt", b"quot", b"apos"):
            return match.group(0)
        if name in custom:
            return custom[name]
        decoded = html5.get(name.decode("ascii") + ";")
        if decoded is not None:
            return decoded.encode("utf-8")
        return match.group(0)

    return _ENTITY_RE.sub(sub, raw)


def _ws(text: Optional[str]) -> str:
    return " ".join(text.split()) if text else ""


class _Segment:
    __slots__ = ("label", "text", "formatting")

    def __init__(self, label: str, text: str, formatting=None):
        self.label = label
        self.text = text
        self.formatting = formatting


def _merge_formatting(formatting: Optional[Formatting],
                      tag: str) -> Optional[Formatting]:
    update = _FORMAT_TAG_MAP.get(tag)
    if update is None:
        return formatting
    base = formatting.copy() if formatting else Formatting()
    for key, value in update.items():
        setattr(base, key, value)
    return base


def _get_text(node, sep: Optional[str] = None) -> str:
    """Reference ``_get_text``: concatenated text skipping terms and
    formulas, newlines as spaces (jats_backend.py:250-266)."""
    skip_tags = ("term", "disp-formula", "inline-formula")
    text = (node.text.replace("\n", " ")
            if (node.tag not in skip_tags and node.text) else "")
    for child in list(node):
        if child.tag not in skip_tags:
            text += _get_text(child, sep)
        if sep:
            text = text.rstrip(sep) + sep
        text += child.tail.replace("\n", " ") if child.tail else ""
    return text


def _node_text(node) -> str:
    return _ws(" ".join(node.itertext()))


def _first_child(node, names: tuple) -> Optional[ET.Element]:
    for child in node:
        if child.tag in names:
            return child
    return None


def _extract_tex_math(node) -> Optional[str]:
    if not node.text:
        return None
    text = node.text.strip()
    for delimiter in ("$$", "$"):
        if (len(text) > 2 * len(delimiter) and text.startswith(delimiter)
                and text.endswith(delimiter)):
            text = text[len(delimiter):-len(delimiter)].strip()
            break
    return text or None


class JatsConverter:
    def __init__(self, raw: bytes, name: str, filename: str,
                 binary_hash: int):
        self.tree = ET.fromstring(_resolve_entities(raw))
        self.doc = Doc(name, filename=filename or f"{name}.xml",
                       binary_hash=binary_hash, mimetype="application/xml")
        self.root = None
        self.hlevel = 0

    # -- metadata -----------------------------------------------------------
    def _find_meta(self):
        for name in ("article-meta", "book-part-meta"):
            found = self.tree.find(f".//{name}")
            if found is not None:
                return found
        return None

    def _parse_title(self) -> str:
        meta_names = ("article-meta", "collection-meta", "book-meta",
                      "book-part-meta")
        title_names = ("article-title", "subtitle", "title", "label")
        titles = []
        for meta_name in meta_names:
            for meta in self.tree.iter(meta_name):
                for tg in meta.findall("title-group"):
                    titles.append(" ".join(
                        (elem.text or "").replace("\n", " ").strip()
                        for elem in list(tg)
                        if elem.tag in title_names).strip())
        return " - ".join(titles)

    def _parse_abstract_section(self, section) -> str:
        texts = []
        for child in section:
            if child.tag == "p":
                t = _ws(_get_text(child))
                if t:
                    texts.append(t)
            elif child.tag == "sec":
                t = self._parse_abstract_section(child)
                if t:
                    texts.append(t)
        content = _ws(" ".join(texts))
        if not content:
            return ""
        label_node = _first_child(section, ("title", "label"))
        if label_node is not None:
            label = _node_text(label_node)
            if label:
                return f"{label}: {content}"
        return content

    def _parse_abstracts(self) -> list[dict]:
        out = []
        for abs_node in self.tree.iter("abstract"):
            texts = []
            for child in abs_node:
                if child.tag == "p":
                    t = _ws(_get_text(child))
                    if t:
                        texts.append(t)
                elif child.tag == "sec":
                    t = self._parse_abstract_section(child)
                    if t:
                        texts.append(t)
            label_node = _first_child(abs_node, ("title", "label"))
            out.append({
                "label": (_node_text(label_node)
                          if label_node is not None else ""),
                "content": _ws(" ".join(texts)),
            })
        return out

    @staticmethod
    def _structured_name(name_node) -> str:
        parts = []
        for tag in ("prefix", "given-names", "surname", "suffix"):
            for part in name_node.findall(tag):
                t = _node_text(part)
                if t:
                    parts.append(t)
        if parts:
            return _ws(" ".join(parts))
        return _node_text(name_node)

    def _contrib_name(self, author) -> str:
        for name_node in author.findall("name"):
            name = self._structured_name(name_node)
            if name:
                return name
        for name_node in author.findall("string-name"):
            name = _node_text(name_node)
            if name:
                return name
        for alt in author.findall("name-alternatives"):
            for tag in ("name", "string-name", "collab-name", "collab"):
                for n in alt.findall(tag):
                    name = (self._structured_name(n) if tag == "name"
                            else _node_text(n))
                    if name:
                        return name
        for tag in ("collab-name", "collab"):
            for n in author.findall(tag):
                name = _node_text(n)
                if name:
                    return name
        for tag in ("collab-name-alternatives", "collab-alternatives"):
            for alt in author.findall(tag):
                for sub in ("name", "string-name", "collab-name", "collab"):
                    for n in alt.findall(sub):
                        name = (self._structured_name(n) if sub == "name"
                                else _node_text(n))
                        if name:
                            return name
        if author.findall("anonymous"):
            return "Anonymous"
        return ""

    def _parse_authors(self) -> list[dict]:
        authors = []
        meta = self._find_meta()
        if meta is None:
            return authors
        aff_names = {}
        for aff in meta.iter("aff"):
            aff_id = aff.get("id")
            if aff_id is None:
                continue
            text = ", ".join(t for t in aff.itertext() if t.strip())
            text = text.replace("\n", " ")
            label = aff.findall("label")
            if label:
                text = text.removeprefix(f"{label[0].text}, ")
            aff_names[aff_id] = text
        for cg in meta.iter("contrib-group"):
            for contrib in cg.findall("contrib"):
                if contrib.get("contrib-type") != "author":
                    continue
                names = [aff_names[x.get("rid")]
                         for x in contrib.findall("xref")
                         if x.get("ref-type") == "aff"
                         and x.get("rid") in aff_names]
                name = self._contrib_name(contrib)
                if not name:
                    continue
                authors.append({"name": name, "affiliation_names": names})
        return authors

    def _add_metadata(self):
        doc = self.doc
        self.root = doc.add_text(parent=None, text=self._parse_title(),
                                 label="title")
        authors = self._parse_authors()
        authors_str = ", ".join(a["name"] for a in authors)
        affiliations = [x for a in authors for x in a["affiliation_names"]]
        affiliations_str = "; ".join(dict.fromkeys(affiliations))
        if authors_str:
            doc.add_text(parent=self.root, text=authors_str,
                         label="paragraph")
        if affiliations_str:
            doc.add_text(parent=self.root, text=affiliations_str,
                         label="paragraph")
        for abstract in self._parse_abstracts():
            if not abstract["content"]:
                continue
            parent = doc.add_heading(
                parent=self.root,
                text=abstract["label"] or DEFAULT_HEADER_ABSTRACT,
                level=self.hlevel + 1)
            doc.add_text(parent=parent, text=abstract["content"],
                         label="text")

    # -- citations ----------------------------------------------------------
    def _parse_element_citation(self, node) -> str:
        c = {k: "" for k in ("author_names", "title", "source", "year",
                             "volume", "page", "pub_id", "publisher_name",
                             "publisher_loc")}
        names = []
        for name_node in node.iter("name"):
            surname = name_node.findall("surname")
            given = name_node.findall("given-names")
            if surname and given:
                names.append(
                    (surname[0].text or "").replace("\n", " ").strip()
                    + " "
                    + (given[0].text or "").replace("\n", " ").strip())
        etal = list(node.iter("etal"))
        if etal:
            names.append(etal[0].text or DEFAULT_TEXT_ETAL)
        c["author_names"] = ", ".join(names)
        title_node = None
        for tag in ("article-title", "chapter-title", "data-title",
                    "issue-title", "part-title", "trans-title"):
            found = node.findall(tag)
            if found:
                title_node = found[0]
                break
        c["title"] = (_get_text(title_node) if title_node is not None
                      else (node.text or "").replace("\n", " ").strip())
        for field in ("source", "year", "publisher-name", "publisher-loc",
                      "volume"):
            found = node.findall(field)
            if found and found[0].text:
                c[field.replace("-", "_")] = \
                    found[0].text.replace("\n", " ").strip()
        pub_ids = []
        for id_node in node.findall("pub-id"):
            id_type = (id_node.get("assigning-authority")
                       or id_node.get("pub-id-type"))
            if id_type and id_node.text:
                pub_ids.append(id_type.replace("\n", " ").strip().upper()
                               + ": "
                               + id_node.text.replace("\n", " ").strip())
        c["pub_id"] = ", ".join(pub_ids)
        eloc = node.findall("elocation-id")
        fpage = node.findall("fpage")
        if eloc and eloc[0].text:
            c["page"] = eloc[0].text.replace("\n", " ").strip()
        elif fpage and fpage[0].text:
            c["page"] = fpage[0].text.replace("\n", " ").strip()
            lpage = node.findall("lpage")
            if lpage and lpage[0].text:
                c["page"] += "–" + \
                    lpage[0].text.replace("\n", " ").strip()
        text = ""
        if c["author_names"]:
            text += c["author_names"].rstrip(".") + ". "
        if c["title"]:
            text += c["title"] + ". "
        if c["source"]:
            text += c["source"] + ". "
        if c["publisher_name"]:
            if c["publisher_loc"]:
                text += f"{c['publisher_loc']}: "
            text += c["publisher_name"] + ". "
        if c["volume"]:
            text = text.rstrip(". ")
            text += f" {c['volume']}. "
        if c["page"]:
            text = text.rstrip(". ")
            if c["volume"]:
                text += ":"
            text += c["page"] + ". "
        if c["year"]:
            text = text.rstrip(". ")
            text += f" ({c['year']})."
        if c["pub_id"]:
            text = text.rstrip(".") + ". "
            text += c["pub_id"]
        return text

    def _add_citation(self, parent, text: str) -> None:
        from .model import GroupItem
        if isinstance(parent, GroupItem) and parent.label == "list":
            self.doc.add_list_item(text=text, enumerated=False,
                                   parent=parent)
        else:
            self.doc.add_text(text=text, label="text", parent=parent)

    # -- figures / tables / footnotes -----------------------------------------
    def _add_figure(self, parent, node) -> None:
        label_node = node.findall("label")
        label = _get_text(label_node[0]).strip() if label_node else ""
        caption_nodes = node.findall("caption")
        caption = None
        if caption_nodes:
            caption = ""
            for par in list(caption_nodes[0]):
                if par.find(".//supplementary-material") is not None or \
                        par.tag == "supplementary-material":
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        fig_text = f"{label}{' ' if label and caption else ''}" \
                   f"{caption if caption else ''}"
        cap_item = (self.doc.add_text(label="caption", text=fig_text)
                    if fig_text else None)
        self.doc.add_picture(parent=parent, caption=cap_item)

    def _cell_spans(self, cell) -> tuple[int, int]:
        def _parse(v):
            try:
                return max(1, int(v))
            except (TypeError, ValueError):
                return 1
        return _parse(cell.get("colspan")), _parse(cell.get("rowspan"))

    def _cell_text(self, cell) -> str:
        """Inner text with inline-formula contents rendered as $$...$$
        when the cell's formula text splits cleanly
        (jats_backend.py:903-912)."""
        parts = []

        def walk(node):
            if node.tag == "inline-formula":
                inner = "".join(node.itertext())
                math_parts = inner.split("$$")
                parts.append(f"$${math_parts[1]}$$"
                             if len(math_parts) == 3 else inner)
                if node.tail:
                    parts.append(node.tail)
                return
            if node.text:
                parts.append(node.text)
            for child in node:
                walk(child)
            if node.tail:
                parts.append(node.tail)

        if cell.text:
            parts.append(cell.text)
        for child in cell:
            walk(child)
        return "".join(parts).strip()

    def parse_table_data(self, table) -> Optional[TableData]:
        if table.find(".//table") is not None:
            return None  # nested tables skipped
        rows = list(table.iter("tr"))
        num_rows = num_cols = 0
        for tr in rows:
            col_count = 0
            is_row_header = True
            for cell in [c for c in tr.iter() if c.tag in ("td", "th")]:
                col_span, row_span = self._cell_spans(cell)
                col_count += col_span
                if cell.tag == "td" or row_span == 1:
                    is_row_header = False
            num_cols = max(num_cols, col_count)
            if not is_row_header:
                num_rows += 1
        grid = [[None] * num_cols for _ in range(num_rows)]
        data = TableData(num_rows=num_rows, num_cols=num_cols)
        start_row_span = 0
        row_idx = -1
        for tr in rows:
            cells = [c for c in tr.iter() if c.tag in ("td", "th")]
            col_header = True
            row_header = True
            for cell in cells:
                _, row_span = self._cell_spans(cell)
                if cell.tag == "td":
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
            for cell in cells:
                text = self._cell_text(cell)
                col_span, row_span = self._cell_spans(cell)
                if row_header:
                    row_span -= 1
                while (col_idx < num_cols
                       and grid[row_idx + start_row_span][col_idx]
                       is not None):
                    col_idx += 1
                for r in range(start_row_span, start_row_span + row_span):
                    for c_i in range(col_span):
                        if (row_idx + r < num_rows
                                and col_idx + c_i < num_cols):
                            grid[row_idx + r][col_idx + c_i] = text
                data.table_cells.append(TableCell(
                    text=text, row_span=row_span, col_span=col_span,
                    start_row_offset_idx=start_row_span + row_idx,
                    end_row_offset_idx=start_row_span + row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=col_header,
                    row_header=(not col_header) and cell.tag == "th"))
        return data

    def _add_tables(self, parent, node) -> None:
        table_el = node.find("table")
        if table_el is None:
            table_el = node.find("alternatives/table")
        caption_nodes = node.findall("caption")
        caption = None
        if caption_nodes:
            caption = ""
            for par in list(caption_nodes[0]):
                if par.find(".//supplementary-material") is not None or \
                        par.tag == "supplementary-material":
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        label_nodes = node.findall("label")
        label = label_nodes[0].text if label_nodes and \
            label_nodes[0].text else ""
        try:
            data = (self.parse_table_data(table_el)
                    if table_el is not None else None)
        except Exception:
            return
        table_text = f"{label}{' ' if label and caption else ''}" \
                     f"{caption if caption else ''}"
        cap_item = (self.doc.add_text(label="caption", text=table_text)
                    if table_text else None)
        if data is not None:
            table_item = self.doc.add_table(data=data, parent=parent)
            if cap_item is not None:
                table_item.captions.append(cap_item.self_ref)

    def _add_footnote_group(self, parent, node) -> None:
        footnotes = [_ws(_get_text(fn)) for fn in node
                     if fn.tag == "fn"]
        if not footnotes:
            return
        title = node.findall("title")
        title_text = (_node_text(title[0]) or DEFAULT_HEADER_FOOTNOTES
                      if title else DEFAULT_HEADER_FOOTNOTES)
        heading = self.doc.add_heading(text=title_text, parent=parent,
                                       level=self.hlevel + 1)
        group = self.doc.add_group(label="list", name="footnotes",
                                   parent=heading)
        for item in footnotes:
            li = self.doc.add_list_item(parent=group, text="")
            inline = self.doc.add_inline_group(parent=li)
            self.doc.add_text(label="footnote", text=item, parent=inline)

    # -- inline segments -------------------------------------------------------
    @staticmethod
    def _append_run(segments, text, formatting) -> None:
        text = text.replace("\n", " ")
        if not text:
            return
        if (segments and segments[-1].label == "text"
                and segments[-1].formatting == formatting):
            segments[-1].text += text
        else:
            segments.append(_Segment("text", text, formatting))

    @classmethod
    def _extend_segments(cls, segments, more) -> None:
        for segment in more:
            if segment.label == "text":
                cls._append_run(segments, segment.text, segment.formatting)
            else:
                segments.append(segment)

    @staticmethod
    def _walk_inline_formula(node, formatting=None) -> list:
        current = _merge_formatting(formatting, node.tag)
        segments: list[_Segment] = []
        if node.text:
            text = node.text.replace("\n", " ")
            if text:
                segments.append(_Segment("text", text, current))
        for child in node:
            tag = child.tag
            if not isinstance(tag, str) or tag.endswith("}math"):
                pass
            elif tag == "tex-math":
                formula = _extract_tex_math(child)
                if formula is not None:
                    segments.append(_Segment("formula", formula))
            else:
                segments.extend(
                    JatsConverter._walk_inline_formula(child, current))
            if child.tail:
                tail = child.tail.replace("\n", " ")
                if tail:
                    segments.append(_Segment("text", tail, current))
        return segments

    def _emit_inline(self, parent, segments) -> None:
        stripped = []
        for segment in segments:
            text = segment.text.strip()
            if text:
                stripped.append(_Segment(segment.label, text,
                                         segment.formatting))
        if not stripped:
            return
        container = (self.doc.add_inline_group(parent=parent)
                     if len(stripped) > 1 else parent)
        for segment in stripped:
            self.doc.add_text(label=segment.label, text=segment.text,
                              formatting=segment.formatting,
                              parent=container)

    # -- linear walk -------------------------------------------------------------
    def _walk_linear(self, parent, node, formatting=None,
                     parent_tag: Optional[str] = None) -> list:
        skip_tags = ("term",)
        flush_tags = ("ack", "sec", "list", "boxed-text", "disp-formula",
                      "fig")
        doc = self.doc
        new_parent = parent
        current = _merge_formatting(formatting, node.tag)
        inline_segments: list[_Segment] = []
        if node.tag not in skip_tags and node.text:
            self._append_run(inline_segments, node.text, current)
        for child in list(node):
            stop_walk = False
            text = None
            if node.tag == "p" and child.tag in flush_tags:
                self._emit_inline(parent, inline_segments)
                inline_segments = []
            if child.tag in ("sec", "ack"):
                header = _first_child(child, ("title", "label"))
                if header is not None:
                    text = _get_text(header)
                elif child.tag == "ack":
                    text = DEFAULT_HEADER_ACKNOWLEDGMENTS
                if text:
                    self.hlevel += 1
                    new_parent = doc.add_heading(text=text, parent=parent,
                                                 level=self.hlevel)
            elif child.tag == "list":
                new_parent = doc.add_group(label="list", name="list",
                                           parent=parent)
            elif child.tag == "list-item":
                text_parts = []
                nested_lists = []
                for elem in child:
                    if elem.tag == "p":
                        text_parts.append(_get_text(elem).strip())
                    elif elem.tag == "list":
                        nested_lists.append(elem)
                text = " ".join(p for p in text_parts if p)
                new_parent = doc.add_list_item(text=text, parent=parent)
                for nested in nested_lists:
                    self._walk_linear(new_parent, nested,
                                      parent_tag=child.tag)
                stop_walk = True
            elif child.tag == "fig":
                self._add_figure(parent, child)
                stop_walk = True
            elif child.tag == "table-wrap":
                self._add_tables(parent, child)
                stop_walk = True
            elif child.tag == "suplementary-material":
                # (sic) the reference checks this misspelled tag
                stop_walk = True
            elif child.tag == "fn-group":
                self._add_footnote_group(parent, child)
                stop_walk = True
            elif child.tag == "ref-list" and node.tag != "ref-list":
                header = _first_child(child, ("title", "label"))
                text = (_get_text(header) if header is not None
                        else DEFAULT_HEADER_REFERENCES)
                new_parent = doc.add_heading(text=text, parent=parent,
                                             level=1)
                new_parent = doc.add_group(parent=new_parent, label="list",
                                           name="list")
            elif child.tag == "element-citation":
                self._add_citation(parent, self._parse_element_citation(
                    child))
                stop_walk = True
            elif child.tag == "mixed-citation":
                self._add_citation(parent, _get_text(child).strip())
                stop_walk = True
            elif child.tag == "tex-math":
                formula = _extract_tex_math(child)
                if formula:
                    doc.add_text(label="formula", text=formula,
                                 parent=parent)
                stop_walk = True
            elif child.tag == "inline-formula":
                self._extend_segments(
                    inline_segments,
                    self._walk_inline_formula(child, current))
                stop_walk = True
            if not stop_walk:
                child_segments = self._walk_linear(
                    new_parent, child, current, parent_tag=node.tag)
                if not (parent_tag == "p" and node.tag in flush_tags):
                    self._extend_segments(inline_segments, child_segments)
                if child.tag in ("sec", "ack") and text:
                    self.hlevel -= 1
            if child.tail:
                self._append_run(inline_segments, child.tail, current)
        if node.tag == "p":
            self._emit_inline(parent, inline_segments)
            return []
        return inline_segments

    def convert(self) -> Doc:
        self.hlevel = 0
        self._add_metadata()
        body = self.tree.find(".//body")
        if body is None and self.tree.tag == "body":
            body = self.tree
        if self.root is not None and body is not None:
            self._walk_linear(self.root, body)
        back = self.tree.find(".//back")
        if self.root is not None and back is not None:
            self._walk_linear(self.root, back)
        return self.doc


def convert_jats(data: bytes, name: str = "file", filename: str = "",
                 binary_hash: int = 0) -> Doc:
    """JATS article bytes -> Doc (reference semantics, see module
    docstring)."""
    return JatsConverter(data, name, filename, binary_hash).convert()
