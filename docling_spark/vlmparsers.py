"""Chandra-OCR-2 HTML and dots.ocr/dots.mocr JSON parsers (VLM-output
ingestion paths).

Reimplements by semantics:
- ``parse_chandra_html`` from the reference
  ``/root/reference/docling/utils/chandra_utils.py`` (322 LoC): each
  layout element is a top-level ``<div data-bbox="x0 y0 x1 y1"
  data-label="Label">content</div>`` with bboxes in a 0-1000
  normalized grid scaled to the page size; tables parsed from inline
  HTML into a span grid, List-Group divs exploded into list items,
  Figure/Image/Diagram become pictures, unknown labels fall back to
  plain text, divs missing either attribute are skipped.
- ``parse_dots_json`` from
  ``/root/reference/docling/utils/dots_utils.py``: a JSON array of
  ``{"bbox": [x1,y1,x2,y2], "category": "Label", "text": "..."}``
  elements in model-pixel coordinates (rescaled when the model input
  size is known), tolerant of the truncated JSON the model emits
  (strip leading junk, cut at the last ``}`` and close the array).
  Consecutive List-item elements share one list group; any other
  category breaks the run.

Fixture parity: ``tests/data/html_chandra/sources/*.html`` and
``tests/data/json_dots/sources/*.json`` with the assertions of the
reference's ``test_chandra_vlm.py`` / ``test_dots_vlm.py``.
"""

from __future__ import annotations

import json
import re

from .deepseekocr import _parse_table_html
from .model import Doc

_CHANDRA_LABEL_MAP = {
    "Text": "text",
    "Title": "title",
    "Section-Header": "section_header",
    "Table": "table",
    "Figure": "picture",
    "Image": "picture",
    "Caption": "caption",
    "Footnote": "footnote",
    "Page-Header": "page_header",
    "Page-Footer": "page_footer",
    "List-Group": "list_item",
    "Equation-Block": "formula",
    "Code-Block": "code",
    "Form": "form",
    "Table-Of-Contents": "text",
    "Complex-Block": "text",
    "Chemical-Block": "formula",
    "Diagram": "picture",
    "Bibliography": "reference",
    "Blank-Page": "text",
}

_DIV_PATTERN = re.compile(r"<div\s+([^>]*?)>(.*?)</div>", re.DOTALL)
_BBOX_ATTR = re.compile(r'data-bbox="(\d+\s+\d+\s+\d+\s+\d+)"')
_LABEL_ATTR = re.compile(r'data-label="([^"]+)"')
_TAG_RE = re.compile(r"<[^>]+>")
_LI_RE = re.compile(r"<li[^>]*>(.*?)</li>", re.DOTALL | re.IGNORECASE)


def _strip_tags(html: str) -> str:
    return re.sub(r"\s+", " ", _TAG_RE.sub("", html)).strip()


def _parse_list_html(html_content: str) -> list[str]:
    items = []
    for m in _LI_RE.finditer(html_content):
        text = _strip_tags(m.group(1))
        if text:
            items.append(text)
    return items


def _prov(page_no: int, l: float, t: float, r: float, b: float) -> dict:
    return {"page_no": page_no,
            "bbox": {"l": round(l, 2), "t": round(t, 2),
                     "r": round(r, 2), "b": round(b, 2),
                     "coord_origin": "TOPLEFT"},
            "charspan": [0, 0]}


def parse_chandra_html(content: str,
                       page_width: float = 612.0,
                       page_height: float = 792.0,
                       page_no: int = 1,
                       filename: str = "file") -> Doc:
    """Chandra-OCR-2 HTML -> Doc (reference semantics, module docs)."""
    doc = Doc(filename.rsplit(".", 1)[0], filename=filename,
              binary_hash=0, mimetype="text/html")
    doc.pages[page_no] = (page_width, page_height)
    if not content or not content.strip():
        return doc
    scale_x = page_width / 1000.0
    scale_y = page_height / 1000.0
    for m in _DIV_PATTERN.finditer(content):
        attrs_str, inner_html = m.group(1), m.group(2)
        bbox_m = _BBOX_ATTR.search(attrs_str)
        label_m = _LABEL_ATTR.search(attrs_str)
        if not bbox_m or not label_m:
            continue
        coords = bbox_m.group(1).split()
        if len(coords) != 4:
            continue
        x0, y0, x1, y1 = (int(c) for c in coords)
        label_str = label_m.group(1)
        prov = _prov(page_no, x0 * scale_x, y0 * scale_y,
                     x1 * scale_x, y1 * scale_y)
        if label_str == "Table":
            doc.add_table(data=_parse_table_html(inner_html), prov=[prov])
        elif label_str == "List-Group":
            group = doc.add_list_group()
            items = _parse_list_html(inner_html) or [_strip_tags(inner_html)]
            for item_text in items:
                doc.add_list_item(text=item_text, parent=group, prov=[prov])
        elif label_str in ("Figure", "Image", "Diagram"):
            doc.add_picture(prov=[prov])
        elif label_str == "Title":
            doc.add_title(text=_strip_tags(inner_html), prov=[prov])
        elif label_str == "Section-Header":
            doc.add_heading(text=_strip_tags(inner_html), prov=[prov])
        else:
            doc.add_text(label=_CHANDRA_LABEL_MAP.get(label_str, "text"),
                         text=_strip_tags(inner_html), prov=[prov])
    return doc


_DOTS_LABEL_MAP = {
    "Text": "text",
    "Title": "title",
    "Section-header": "section_header",
    "Table": "table",
    "Picture": "picture",
    "Caption": "caption",
    "Footnote": "footnote",
    "Page-header": "page_header",
    "Page-footer": "page_footer",
    "List-item": "list_item",
    "Formula": "formula",
}


def _clean_dots_json(raw: str) -> str:
    """Best-effort recovery of truncated model output
    (dots_utils.py:58-76)."""
    idx = raw.find("[")
    if idx == -1:
        return "[]"
    raw = raw[idx:]
    stripped = raw.rstrip()
    if not stripped.endswith("]"):
        last_brace = stripped.rfind("}")
        if last_brace == -1:
            return "[]"
        raw = stripped[:last_brace + 1] + "]"
    return raw


def parse_dots_json(content: str,
                    page_width: float = 612.0,
                    page_height: float = 792.0,
                    page_no: int = 1,
                    filename: str = "file",
                    model_image_size: tuple | None = None) -> Doc:
    """dots.ocr / dots.mocr JSON -> Doc (reference semantics)."""
    doc = Doc(filename.rsplit(".", 1)[0], filename=filename,
              binary_hash=0, mimetype="application/json")
    doc.pages[page_no] = (page_width, page_height)
    if not content or not content.strip():
        return doc
    if model_image_size is not None:
        scale_x = page_width / model_image_size[0]
        scale_y = page_height / model_image_size[1]
    else:
        scale_x = scale_y = 1.0
    try:
        elements = json.loads(_clean_dots_json(content))
    except json.JSONDecodeError:
        return doc
    if not isinstance(elements, list):
        return doc
    current_group = None
    for elem in elements:
        if not isinstance(elem, dict):
            continue
        category = elem.get("category", "")
        raw_bbox = elem.get("bbox")
        text = elem.get("text", "")
        if (not raw_bbox or not isinstance(raw_bbox, list)
                or len(raw_bbox) != 4):
            continue
        try:
            x1, y1, x2, y2 = (float(v) for v in raw_bbox)
        except (ValueError, TypeError):
            continue
        prov = _prov(page_no, x1 * scale_x, y1 * scale_y,
                     x2 * scale_x, y2 * scale_y)
        if category == "Table":
            current_group = None
            doc.add_table(data=_parse_table_html(text), prov=[prov])
        elif category == "Picture":
            current_group = None
            doc.add_picture(prov=[prov])
        elif category == "Title":
            current_group = None
            doc.add_title(text=text, prov=[prov])
        elif category == "Section-header":
            current_group = None
            doc.add_heading(text=text, prov=[prov])
        elif category == "List-item":
            if current_group is None:
                current_group = doc.add_list_group()
            doc.add_list_item(text=text, parent=current_group, prov=[prov])
        else:
            current_group = None
            doc.add_text(label=_DOTS_LABEL_MAP.get(category, "text"),
                         text=text, prov=[prov])
    return doc


def convert_chandra(data: bytes, name: str = "file",
                    filename: str = "") -> Doc:
    return parse_chandra_html(data.decode("utf-8", errors="replace"),
                              filename=filename or f"{name}.html")


def convert_dots(data: bytes, name: str = "file",
                 filename: str = "") -> Doc:
    return parse_dots_json(data.decode("utf-8", errors="replace"),
                           filename=filename or f"{name}.json")


_CHANDRA_FIRST_DIV = re.compile(
    rb'\A\s*<div\s[^>]*data-bbox="\d+\s+\d+\s+\d+\s+\d+"[^>]*'
    rb'data-label="([^"]+)"')
_CHANDRA_FIRST_DIV_REV = re.compile(
    rb'\A\s*<div\s[^>]*data-label="([^"]+)"[^>]*'
    rb'data-bbox="\d+\s+\d+\s+\d+\s+\d+"')


def sniff_chandra(data: bytes) -> bool:
    """A chandra payload is a bare sequence of top-level
    ``<div data-bbox data-label>`` blocks (chandra-ocr-2 VLM output; the
    reference only ever feeds this parser VLM responses, never crawled
    pages — ``docling/utils/chandra_utils.py:1-6``).

    The sniff therefore requires the FIRST non-whitespace element to be
    such a div with a numeric 0-1000 bbox and a known chandra label
    value; ordinary crawled HTML (doctype/<html>/<head> first, or pages
    that merely mention data-bbox somewhere) never matches.
    """
    head = data[:4096]
    m = _CHANDRA_FIRST_DIV.match(head) or _CHANDRA_FIRST_DIV_REV.match(head)
    if not m:
        return False
    label = m.group(1).decode("utf-8", errors="replace")
    return label in _CHANDRA_LABEL_MAP


def sniff_dots(data: bytes) -> bool:
    """A dots payload is a JSON array of {bbox, category, ...} dicts."""
    head = data.lstrip()[:4096]
    if not head.startswith(b"["):
        return False
    return b'"bbox"' in head and b'"category"' in head
