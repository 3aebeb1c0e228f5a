"""Box Notes (.boxnote) backend: ProseMirror-style JSON -> Doc.

Reimplements the semantics of the reference's BoxNote backend
(``/root/reference/docling/backend/boxnote_backend.py``): the current
(post-August-2022) "doc" node tree maps to titles/headings (level 1 ->
title, level N -> heading N-1), paragraphs as runs (one styled run keeps
its marks, several become an inline group), bullet/ordered/check lists
(check items as checkbox_selected/unselected), code blocks, tables with
row/col spans and rich cells (multi-block or styled cells become
referenced groups), and images whose alt/fileName becomes the caption.
Only http/https/mailto link marks become hyperlinks.
"""

from __future__ import annotations

import json
from typing import Any, Optional
from urllib.parse import urlparse

from .model import Doc, Formatting, TableCell, TableData

_SAFE_LINK_SCHEMES = frozenset({"http", "https", "mailto"})

BOXNOTE_MIMETYPE = "application/vnd.box.boxnote"


def _as_url(href: str) -> Optional[str]:
    try:
        if urlparse(href).scheme not in _SAFE_LINK_SCHEMES:
            return None
        return href
    except ValueError:
        return None


def _marks(marks: list) -> tuple[Optional[Formatting], Optional[str]]:
    formatting = None
    hyperlink = None
    for mark in marks or []:
        mark_type = mark.get("type")
        if mark_type == "strong":
            formatting = formatting or Formatting()
            formatting.bold = True
        elif mark_type == "em":
            formatting = formatting or Formatting()
            formatting.italic = True
        elif mark_type == "underline":
            formatting = formatting or Formatting()
            formatting.underline = True
        elif mark_type == "strikethrough":
            formatting = formatting or Formatting()
            formatting.strikethrough = True
        elif mark_type == "link":
            href = mark.get("attrs", {}).get("href")
            if isinstance(href, str) and href:
                hyperlink = _as_url(href)
    return formatting, hyperlink


def _runs(content: list) -> list[tuple]:
    runs = []
    for node in content or []:
        node_type = node.get("type")
        if node_type == "text":
            text = node.get("text", "")
            if text:
                formatting, hyperlink = _marks(node.get("marks", []))
                runs.append((text, formatting, hyperlink))
        elif node_type == "hard_break":
            runs.append((" ", None, None))
    return runs


def _collapse(content: list) -> tuple:
    runs = _runs(content)
    if len(runs) == 1:
        return runs[0]
    return "".join(t for t, _, _ in runs), None, None


def _plain_text(nodes: list) -> str:
    parts = []
    for node in nodes or []:
        node_type = node.get("type")
        if node_type == "text":
            parts.append(node.get("text", ""))
        elif node_type == "hard_break":
            parts.append("\n")
        elif node.get("content"):
            parts.append(_plain_text(node["content"]))
    return "".join(parts)


def _cell_text(blocks: list) -> str:
    texts = (_plain_text(b.get("content", [])).strip() for b in blocks)
    return " ".join(t for t in texts if t)


def _cell_is_rich(blocks: list) -> bool:
    meaningful = [b for b in blocks
                  if b.get("type") != "paragraph"
                  or _runs(b.get("content", []))]
    if len(meaningful) > 1:
        return True
    if any(b.get("type") != "paragraph" for b in meaningful):
        return True
    return any(fmt or link for b in meaningful
               for _, fmt, link in _runs(b.get("content", [])))


class BoxNoteConverter:
    def __init__(self, doc: Doc):
        self.doc = doc

    def add_blocks(self, nodes: list, parent) -> None:
        for node in nodes:
            self.add_block(node, parent)

    def add_block(self, node: dict, parent) -> None:
        doc = self.doc
        node_type = node.get("type")
        content = node.get("content", [])
        if node_type == "heading":
            text, formatting, hyperlink = _collapse(content)
            if text:
                level = node.get("attrs", {}).get("level") or 1
                if level <= 1:
                    doc.add_title(text=text, parent=parent,
                                  formatting=formatting,
                                  hyperlink=hyperlink)
                else:
                    doc.add_heading(text=text, level=level - 1,
                                    parent=parent, formatting=formatting,
                                    hyperlink=hyperlink)
        elif node_type == "paragraph":
            self._add_paragraph(content, parent)
        elif node_type in ("bullet_list", "ordered_list", "check_list"):
            self._add_list(node_type, content, parent)
        elif node_type == "code_block":
            code = _plain_text(content)
            if code:
                doc.add_code(text=code, parent=parent)
        elif node_type == "table":
            self._add_table(content, parent)
        elif node_type == "image":
            self._add_image(node.get("attrs", {}), parent)
        elif content:
            # blockquote / call_out_box wrappers: keep the inner blocks
            self.add_blocks(content, parent)

    def _add_paragraph(self, content: list, parent) -> None:
        runs = _runs(content)
        if not runs:
            return
        doc = self.doc
        if len(runs) == 1:
            text, formatting, hyperlink = runs[0]
            doc.add_text(label="text", text=text, parent=parent,
                         formatting=formatting, hyperlink=hyperlink)
            return
        group = doc.add_inline_group(parent=parent)
        for text, formatting, hyperlink in runs:
            doc.add_text(label="text", text=text, parent=group,
                         formatting=formatting, hyperlink=hyperlink)

    def _add_list(self, list_type: str, items: list, parent) -> None:
        enumerated = list_type == "ordered_list"
        group = self.doc.add_list_group(name="list", parent=parent)
        for item in items:
            if item.get("type") == "check_list_item":
                self._add_check_item(item, group)
            else:
                self._add_list_item(item, group, enumerated)

    def _split_item(self, item: dict) -> tuple:
        text, formatting, hyperlink = "", None, None
        nested = []
        for child in item.get("content", []):
            if not text and child.get("type") == "paragraph":
                text, formatting, hyperlink = _collapse(
                    child.get("content", []))
            else:
                nested.append(child)
        return text, formatting, hyperlink, nested

    def _add_list_item(self, item: dict, group, enumerated: bool) -> None:
        text, formatting, hyperlink, nested = self._split_item(item)
        list_item = self.doc.add_list_item(
            text=text, enumerated=enumerated, parent=group,
            formatting=formatting, hyperlink=hyperlink)
        if nested:
            self.add_blocks(nested, list_item)

    def _add_check_item(self, item: dict, group) -> None:
        text, formatting, hyperlink, nested = self._split_item(item)
        label = ("checkbox_selected"
                 if item.get("attrs", {}).get("checked")
                 else "checkbox_unselected")
        check_item = self.doc.add_text(label=label, text=text, parent=group,
                                       formatting=formatting,
                                       hyperlink=hyperlink)
        if nested:
            self.add_blocks(nested, check_item)

    def _add_table(self, rows: list, parent) -> None:
        doc = self.doc
        rows = [r for r in rows if r.get("type") == "table_row"]
        if not rows:
            return
        data = TableData(num_rows=len(rows), num_cols=0)
        table = doc.add_table(data=data, parent=parent)
        occupied: set[tuple[int, int]] = set()
        num_cols = 0
        for row_idx, row in enumerate(rows):
            col_idx = 0
            for cell in row.get("content", []):
                cell_type = cell.get("type")
                if cell_type not in ("table_cell", "table_header"):
                    continue
                while (row_idx, col_idx) in occupied:
                    col_idx += 1
                attrs = cell.get("attrs", {})
                row_span = attrs.get("rowspan") or 1
                col_span = attrs.get("colspan") or 1
                blocks = cell.get("content", [])
                is_header = cell_type == "table_header"
                kwargs = dict(
                    text=_cell_text(blocks), row_span=row_span,
                    col_span=col_span,
                    start_row_offset_idx=row_idx,
                    end_row_offset_idx=row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=is_header)
                if _cell_is_rich(blocks):
                    group = doc.add_group(label="unspecified",
                                          name="table_cell", parent=table)
                    self.add_blocks(blocks, group)
                    doc.add_table_cell(
                        table, TableCell(**kwargs, ref=group.self_ref))
                else:
                    doc.add_table_cell(table, TableCell(**kwargs))
                for sr in range(row_idx, row_idx + row_span):
                    for sc in range(col_idx, col_idx + col_span):
                        occupied.add((sr, sc))
                col_idx += col_span
                num_cols = max(num_cols, col_idx)
        table.data.num_cols = num_cols

    def _add_image(self, attrs: dict, parent) -> None:
        caption = None
        label = attrs.get("alt") or attrs.get("fileName")
        if label:
            caption = self.doc.add_text(label="caption", text=label)
        self.doc.add_picture(caption=caption, parent=parent)


def convert_boxnote(data: bytes, name: str = "file", filename: str = "",
                    binary_hash: int = 0) -> Doc:
    """Box Note bytes -> Doc (reference semantics, see module
    docstring)."""
    loaded: Any = json.loads(data.decode("utf-8"))
    if not isinstance(loaded, dict) or not isinstance(
            loaded.get("doc"), dict):
        raise ValueError("not a current-format Box Note")
    doc = Doc(name, filename=filename or f"{name}.boxnote",
              binary_hash=binary_hash, mimetype=BOXNOTE_MIMETYPE)
    BoxNoteConverter(doc).add_blocks(loaded["doc"].get("content", []),
                                     parent=None)
    return doc
