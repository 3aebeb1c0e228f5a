"""DeepSeek-OCR annotated-markdown parser (the VLM-output ingestion path).

Reimplements ``parse_deepseekocr_markdown`` from the reference
(``/root/reference/docling/utils/deepseekocr_utils.py``): VLM output of
the form ``<|ref|>label<|/ref|><|det|>[[x1,y1,x2,y2]]<|/det|>`` (or bare
``label[[...]]``) followed by the element content. Labels map to
titles/headings (hash-prefix stripped, heading level = #count - 1),
text, page header/footer, captions, figures, and tables whose content is
an inline HTML ``<table>`` parsed into a span grid. Captions directly
after their table/figure attach to it. Bounding boxes arrive in a
0-1000 grid and are scaled to the page size (coords rounded to 2
decimals like docling-core's serializer).
"""

from __future__ import annotations

import re
from typing import Optional

from .model import Doc, TableCell, TableData

_ANNOTATION_RE = re.compile(
    r"^(?:<\|ref\|>)?(\w+)(?:<\|/ref\|>)?(?:<\|det\|>)?"
    r"\[\[([0-9., ]+)\]\](?:<\|/det\|>)?\s*$")

_LABEL_MAP = {
    "text": "text",
    "title": "title",
    "sub_title": "section_header",
    "table": "table",
    "table_caption": "caption",
    "figure": "picture",
    "figure_caption": "caption",
    "image": "picture",
    "image_caption": "caption",
    "header": "page_header",
    "footer": "page_footer",
}


def _parse_table_html(html_content: str) -> TableData:
    """Inline HTML <table> -> span grid (deepseekocr_utils.py:27-118)."""
    match = re.search(r"<table[^>]*>.*?</table>", html_content,
                      re.DOTALL | re.IGNORECASE)
    if not match:
        return TableData(num_rows=0, num_cols=0)
    from .dom import parse_html
    try:
        root = parse_html(match.group(0).encode("utf-8"))
    except Exception:
        return TableData(num_rows=0, num_cols=0)
    rows = [el for el in _iter_tags(root, "tr")]
    if not rows:
        return TableData(num_rows=0, num_cols=0)
    num_rows = len(rows)
    num_cols = 0
    for tr in rows:
        count = 0
        for cell in _row_cells(tr):
            count += _int_attr(cell, "colspan")
        num_cols = max(num_cols, count)
    grid = [[None] * num_cols for _ in range(num_rows)]
    data = TableData(num_rows=num_rows, num_cols=num_cols)
    for row_idx, tr in enumerate(rows):
        col_idx = 0
        for cell in _row_cells(tr):
            while col_idx < num_cols and grid[row_idx][col_idx] is not None:
                col_idx += 1
            if col_idx >= num_cols:
                break
            text = _cell_text(cell)
            colspan = _int_attr(cell, "colspan")
            rowspan = _int_attr(cell, "rowspan")
            is_header = cell.name.lower() == "th"
            for r in range(row_idx, min(row_idx + rowspan, num_rows)):
                for c in range(col_idx, min(col_idx + colspan, num_cols)):
                    grid[r][c] = text
            data.table_cells.append(TableCell(
                text=text, row_span=rowspan, col_span=colspan,
                start_row_offset_idx=row_idx,
                end_row_offset_idx=row_idx + rowspan,
                start_col_offset_idx=col_idx,
                end_col_offset_idx=col_idx + colspan,
                column_header=is_header and row_idx == 0,
                row_header=is_header and col_idx == 0))
            col_idx += colspan
    return data


def _iter_tags(node, name):
    for child in getattr(node, "children", []) or []:
        if getattr(child, "name", None) == name:
            yield child
        yield from _iter_tags(child, name)


def _row_cells(tr):
    return [c for c in getattr(tr, "children", []) or []
            if getattr(c, "name", None) in ("td", "th")]


def _cell_text(cell) -> str:
    parts = []

    def walk(node):
        data = getattr(node, "data", None)
        if isinstance(data, str) and not getattr(node, "is_comment", False):
            parts.append(data)
        for child in getattr(node, "children", []) or []:
            walk(child)

    walk(cell)
    return "".join(parts).strip()


def _int_attr(cell, name: str) -> int:
    try:
        return max(1, int(cell.attrs.get(name, "1")))
    except (AttributeError, TypeError, ValueError):
        return 1


def _collect_content(lines, i, label_str, visited) -> tuple[str, int]:
    """Gather the content lines following an annotation
    (deepseekocr_utils.py:120-172)."""
    content_lines: list[str] = []
    if label_str == "table":
        started = False
        ii = i
        while ii < len(lines):
            line = lines[ii]
            if "<table" in line.lower():
                started = True
            if started:
                visited.add(ii)
                content_lines.append(line.rstrip())
            if started and "</table>" in line.lower():
                break
            ii += 1
    else:
        while i < len(lines):
            stripped = lines[i].strip()
            if stripped:
                if _ANNOTATION_RE.match(stripped):
                    break
                visited.add(i)
                content_lines.append(lines[i].rstrip())
                i += 1
                if label_str not in ("figure", "image"):
                    break
            else:
                i += 1
                if content_lines:
                    break
    return "\n".join(content_lines), i


def _strip_hashes(content: str) -> tuple[str, int]:
    count = 0
    for ch in content:
        if ch == "#":
            count += 1
        else:
            break
    return content[count:].strip(), count


def parse_deepseekocr_markdown(content: str,
                               page_width: float = 612.0,
                               page_height: float = 792.0,
                               page_no: int = 1,
                               filename: str = "file") -> Doc:
    """Annotated VLM markdown -> Doc (reference semantics, see module
    docstring)."""
    doc = Doc(filename.rsplit(".", 1)[0], filename=filename,
              binary_hash=0, mimetype="text/markdown")
    doc.pages[page_no] = (page_width, page_height)
    scale_x = page_width / 1000
    scale_y = page_height / 1000

    lines = content.split("\n")
    annotations = []
    visited: set[int] = set()
    i = 0
    while i < len(lines):
        if i in visited:
            i += 1
            continue
        match = _ANNOTATION_RE.match(lines[i].strip())
        if match:
            label_str, coords_str = match.group(1), match.group(2)
            try:
                coords = [float(x.strip()) for x in coords_str.split(",")]
            except ValueError:
                coords = []
            if len(coords) == 4:
                prov = {"page_no": page_no,
                        "bbox": {"l": round(coords[0] * scale_x, 2),
                                 "t": round(coords[1] * scale_y, 2),
                                 "r": round(coords[2] * scale_x, 2),
                                 "b": round(coords[3] * scale_y, 2),
                                 "coord_origin": "TOPLEFT"},
                        "charspan": [0, 0]}
                i += 1
                text, i = _collect_content(lines, i, label_str, visited)
                annotations.append((label_str, text, prov))
                continue
        i += 1

    for idx, (label_str, text, prov) in enumerate(annotations):
        caption_item = None
        if label_str in ("table", "figure", "image") \
                and idx + 1 < len(annotations):
            next_label, next_text, next_prov = annotations[idx + 1]
            if next_label == f"{label_str}_caption":
                caption_item = doc.add_text(
                    label=_LABEL_MAP.get(next_label, "caption"),
                    text=next_text, prov=[next_prov])
        if label_str in ("figure_caption", "table_caption",
                         "image_caption"):
            if idx > 0 and annotations[idx - 1][0] == \
                    label_str.rsplit("_", 1)[0]:
                continue
        if label_str in ("figure", "image"):
            doc.add_picture(caption=caption_item, prov=[prov])
        elif label_str == "table":
            table = doc.add_table(data=_parse_table_html(text),
                                  prov=[prov])
            if caption_item is not None:
                table.captions.append(caption_item.self_ref)
        elif label_str == "title":
            clean, _ = _strip_hashes(text) if text.startswith("#") \
                else (text, 0)
            doc.add_title(text=clean, prov=[prov])
        elif label_str == "sub_title":
            level = 1
            clean = text
            if text.startswith("#"):
                clean, hashes = _strip_hashes(text)
                if hashes > 1:
                    level = hashes - 1
            doc.add_heading(text=clean, level=level, prov=[prov])
        else:
            doc.add_text(label=_LABEL_MAP.get(label_str, "text"),
                         text=text, prov=[prov])
    return doc


def convert_deepseekocr(data: bytes, name: str = "file",
                        filename: str = "",
                        binary_hash: int = 0) -> Doc:
    """VLM annotated-markdown bytes -> Doc (binary_hash stays 0 like the
    reference's parse path)."""
    return parse_deepseekocr_markdown(
        data.decode("utf-8", errors="replace"),
        filename=filename or f"{name}.md")
