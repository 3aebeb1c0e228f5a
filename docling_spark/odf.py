"""OpenDocument (ODT / ODS / ODP) backends on stdlib zipfile + ElementTree.

Reimplements the semantics of the reference's OpenDocument backend
(``/root/reference/docling/backend/opendocument_backend.py``, which is
built on the odfdo library) from scratch:

- ODT: the office:text children walk — headings with outline levels,
  paragraphs as normalized formatted-run flows (single run -> text item,
  several -> inline group), nested lists with list-style-driven
  enumeration/markers and cross-sibling list continuation, tables with
  covered-cell spans and rich cells (lists/multi-paragraph/image cells
  become groups referenced from the cell), frames with embedded charts
  (classified + data grid from the object's ``local-table``) and images.
- ODS: every sheet is a page + ``section`` group named ``sheet: <name>``;
  disconnected data regions are flood-filled into separate tables with
  cell-coordinate provenance; hidden sheets land on the invisible layer.
- ODP: every slide is a ``chapter`` group; a slide without a visible
  title gets its page name as one; frames contribute charts, tables,
  images, and text boxes (first text-bearing custom shape is the title).

Formatting derives from text styles (font-weight >= 600 or "bold",
italic/oblique, underline/line-through styles, text-position
super/sub), merged across runs exactly like the reference's
normalization (empty-run drop, same-format merge, edge strip).
"""

from __future__ import annotations

import re
import zipfile
from decimal import Decimal, InvalidOperation
from io import BytesIO
from typing import Any, Optional
from xml.etree import ElementTree as ET

from .model import BODY, Doc, Formatting, TableCell, TableData

_NS = {
    "office": "urn:oasis:names:tc:opendocument:xmlns:office:1.0",
    "text": "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
    "table": "urn:oasis:names:tc:opendocument:xmlns:table:1.0",
    "draw": "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0",
    "style": "urn:oasis:names:tc:opendocument:xmlns:style:1.0",
    "fo": ("urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0"),
    "xlink": "http://www.w3.org/1999/xlink",
    "chart": "urn:oasis:names:tc:opendocument:xmlns:chart:1.0",
    "presentation": ("urn:oasis:names:tc:opendocument:xmlns:"
                     "presentation:1.0"),
    "anim": "urn:oasis:names:tc:opendocument:xmlns:animation:1.0",
    "svg": ("urn:oasis:names:tc:opendocument:xmlns:"
            "svg-compatible:1.0"),
}
_URL2PREF = {v: k for k, v in _NS.items()}

_CHART_CLASS_MAP = {
    "chart:bar": "bar_chart",
    "chart:line": "line_chart",
    "chart:circle": "pie_chart",
    "chart:pie": "pie_chart",
    "chart:scatter": "scatter_plot",
}

ODT_MIMETYPE = "application/vnd.oasis.opendocument.text"
ODS_MIMETYPE = "application/vnd.oasis.opendocument.spreadsheet"
ODP_MIMETYPE = "application/vnd.oasis.opendocument.presentation"


def _pref(qual: str) -> str:
    """'{urn:...:text:1.0}p' -> 'text:p'."""
    if qual.startswith("{"):
        url, _, local = qual[1:].partition("}")
        prefix = _URL2PREF.get(url)
        return f"{prefix}:{local}" if prefix else local
    return qual


def _qual(pref: str) -> str:
    prefix, _, local = pref.partition(":")
    return f"{{{_NS[prefix]}}}{local}" if prefix in _NS else pref


class E:
    """Prefixed-name view over an ElementTree element (odfdo-like API)."""

    __slots__ = ("el", "tag", "_children")

    def __init__(self, el):
        self.el = el
        self.tag = _pref(el.tag)
        self._children = None

    @property
    def attributes(self) -> dict:
        return {_pref(k): v for k, v in self.el.attrib.items()}

    def get(self, name: str):
        return self.el.get(_qual(name))

    @property
    def children(self) -> list["E"]:
        if self._children is None:
            self._children = [E(c) for c in self.el]
        return self._children

    @property
    def text(self):
        if self.tag == "text:s":
            try:
                return " " * int(self.get("text:c") or 1)
            except ValueError:
                return " "
        if self.tag == "text:tab":
            return "\t"
        if self.tag == "text:line-break":
            return self.el.text or "\n"
        return self.el.text

    @property
    def tail(self):
        return self.el.tail

    @property
    def text_recursive(self) -> str:
        parts = []
        if self.text:
            parts.append(self.text)
        for child in self.children:
            parts.append(child.text_recursive)
            if child.el.tail:
                parts.append(child.el.tail)
        return "".join(parts)

    def iter_desc(self, tag: str):
        for el in self.el.iter(_qual(tag)):
            if el is not self.el:
                yield E(el)

    def get_images(self) -> list["E"]:
        return list(self.iter_desc("draw:image"))

    def find(self, tag: str) -> Optional["E"]:
        found = self.el.find(_qual(tag))
        return E(found) if found is not None else None


# ---------------------------------------------------------------------------
# package + styles
# ---------------------------------------------------------------------------

class OdfPackage:
    def __init__(self, data: bytes):
        self.zf = zipfile.ZipFile(BytesIO(data))
        self.names = set(self.zf.namelist())
        if any(n.startswith("/") or ".." in n for n in self.names):
            raise ValueError("unsafe zip paths")
        self.mimetype = ""
        if "mimetype" in self.names:
            self.mimetype = self.zf.read("mimetype").decode(
                "utf-8", "replace").strip()
        self.content = self._xml("content.xml")
        if self.content is None:
            raise ValueError("not an OpenDocument package")
        self.styles_root = self._xml("styles.xml")
        # (family, name) -> style element; list styles under family "list"
        self._styles: dict[tuple[str, str], E] = {}
        for root in (self.styles_root, self.content):
            if root is None:
                continue
            for el in root.el.iter(_qual("style:style")):
                e = E(el)
                fam, name = e.get("style:family"), e.get("style:name")
                if fam and name:
                    self._styles.setdefault((fam, name), e)
            for el in root.el.iter(_qual("text:list-style")):
                e = E(el)
                name = e.get("style:name")
                if name:
                    self._styles.setdefault(("list", name), e)

    def _xml(self, name: str) -> Optional[E]:
        if name not in self.names:
            return None
        try:
            return E(ET.fromstring(self.zf.read(name)))
        except ET.ParseError:
            return None

    def get_type(self) -> str:
        body = self.body
        if body is not None:
            return body.tag.split(":")[-1]
        return ""

    @property
    def body(self) -> Optional[E]:
        office_body = self.content.find("office:body")
        if office_body is None:
            return None
        return office_body.children[0] if office_body.children else None

    def get_style(self, family: str, name: Optional[str]) -> Optional[E]:
        if name is None:
            return None
        return self._styles.get((family, name))

    def get_part(self, href: str) -> Optional[bytes]:
        name = href.removeprefix("./").lstrip("/")
        if name in self.names:
            return self.zf.read(name)
        return None

    def get_part_xml(self, href: str) -> Optional[E]:
        data = self.get_part(href)
        if data is None:
            return None
        try:
            return E(ET.fromstring(data))
        except ET.ParseError:
            return None


def text_style_props(style: Optional[E]) -> dict:
    if style is None:
        return {}
    props = style.find("style:text-properties")
    return props.attributes if props is not None else {}


def _is_bold_weight(value: str) -> bool:
    if value == "bold":
        return True
    if value in {"normal", ""}:
        return False
    try:
        return int(value) >= 600
    except ValueError:
        return False


_DEFAULT_FMT = Formatting()


def formatting_from_text_style(pkg: OdfPackage, style_name: Optional[str],
                               base: Optional[Formatting] = None
                               ) -> Optional[Formatting]:
    """Formatting from a text style's text-properties
    (opendocument_backend.py:235-299)."""
    fmt = base.copy() if base is not None else Formatting()
    style = pkg.get_style("text", style_name)
    if style is None:
        return None if fmt == _DEFAULT_FMT else fmt
    props = text_style_props(style)
    weight = next((props[n] for n in ("fo:font-weight",
                                      "style:font-weight-asian",
                                      "style:font-weight-complex")
                   if n in props), None)
    if weight is not None:
        fmt.bold = _is_bold_weight(weight)
    font_style = next((props[n] for n in ("fo:font-style",
                                          "style:font-style-asian",
                                          "style:font-style-complex")
                       if n in props), None)
    if font_style is not None:
        fmt.italic = font_style in {"italic", "oblique"}
    underline = props.get("style:text-underline-style")
    if underline is not None:
        fmt.underline = underline != "none"
    line_through = (props.get("style:text-line-through-style")
                    or props.get("style:text-line-through-type"))
    if line_through is not None:
        fmt.strikethrough = line_through != "none"
    position = props.get("style:text-position")
    if position is not None:
        if position.startswith("super"):
            fmt.script = "super"
        elif position.startswith("sub"):
            fmt.script = "sub"
        else:
            fmt.script = "baseline"
    return None if fmt == _DEFAULT_FMT else fmt


# ---------------------------------------------------------------------------
# text runs
# ---------------------------------------------------------------------------

class Run:
    __slots__ = ("text", "formatting")

    def __init__(self, text: str, formatting: Optional[Formatting] = None):
        self.text = text
        self.formatting = formatting


def text_runs(element: E, pkg: OdfPackage,
              inherited: Optional[Formatting] = None) -> list[Run]:
    """Recursive formatted-run extraction
    (opendocument_backend.py:301-333)."""
    style_name = element.get("text:style-name")
    formatting = formatting_from_text_style(pkg, style_name, inherited)
    if element.tag == "text:line-break":
        return [Run(element.el.text or "\n", formatting)]
    if element.tag == "text:tab":
        return [Run("\t", formatting)]
    runs: list[Run] = []
    children = element.children
    if element.text:
        runs.append(Run(element.text, formatting))
    for child in children:
        runs.extend(text_runs(child, pkg, formatting))
        if child.el.tail:
            runs.append(Run(child.el.tail, formatting))
    if not runs and not children:
        inner = element.text_recursive
        if inner:
            runs.append(Run(inner, formatting))
    return runs


def normalize_runs(runs: list[Run]) -> list[Run]:
    merged: list[Run] = []
    for run in runs:
        if run.text == "":
            continue
        if merged and merged[-1].formatting == run.formatting:
            merged[-1].text += run.text
        else:
            merged.append(Run(run.text, run.formatting))
    while merged and merged[0].text.strip() == "":
        merged.pop(0)
    if merged:
        merged[0].text = merged[0].text.lstrip()
    while merged and merged[-1].text.strip() == "":
        merged.pop()
    if merged:
        merged[-1].text = merged[-1].text.rstrip()
    return [r for r in merged if r.text]


def text_from_runs(runs: list[Run]) -> str:
    return "".join(r.text for r in normalize_runs(runs)).strip()


def _clean_lines(text: str) -> list[str]:
    return [ln for ln in (ln.strip() for ln in text.splitlines()) if ln]


# ---------------------------------------------------------------------------
# conversion core (shared by odt/ods/odp)
# ---------------------------------------------------------------------------

class _ListState:
    __slots__ = ("group", "last_item", "enumerated", "counter")

    def __init__(self, group, last_item, enumerated, counter):
        self.group = group
        self.last_item = last_item
        self.enumerated = enumerated
        self.counter = counter


class OdfConverter:
    def __init__(self, pkg: OdfPackage, doc: Doc):
        self.pkg = pkg
        self.doc = doc

    # -- text items ---------------------------------------------------------
    def add_runs(self, runs: list[Run], label: str, parent,
                 content_layer=BODY):
        runs = normalize_runs(runs)
        if not runs:
            return None
        doc = self.doc
        if len(runs) == 1:
            return doc.add_text(label=label, parent=parent,
                                text=runs[0].text,
                                content_layer=content_layer,
                                formatting=runs[0].formatting)
        inline = doc.add_inline_group(parent=parent,
                                      content_layer=content_layer)
        for run in runs:
            doc.add_text(label=label, parent=inline, text=run.text,
                         content_layer=content_layer,
                         formatting=run.formatting)
        return inline

    def add_heading(self, element: E, parent, content_layer=BODY):
        try:
            level = int(element.get("text:outline-level") or 1)
        except ValueError:
            level = 1
        runs = normalize_runs(text_runs(element, self.pkg))
        text = text_from_runs(runs)
        if not text:
            return
        doc = self.doc
        if len(runs) == 1:
            doc.add_heading(parent=parent, text=text, level=max(1, level),
                            content_layer=content_layer,
                            formatting=runs[0].formatting)
            return
        inline = doc.add_inline_group(parent=parent,
                                      content_layer=content_layer)
        for run in runs:
            doc.add_heading(parent=inline, text=run.text,
                            level=max(1, level),
                            content_layer=content_layer,
                            formatting=run.formatting)

    def paragraph_style_names(self, element: E) -> set:
        names = set()
        style_name = element.get("text:style-name")
        if style_name is not None:
            names.add(style_name)
            style = self.pkg.get_style("paragraph", style_name)
            if style is not None:
                for attr in ("style:parent-style-name",
                             "style:display-name"):
                    v = style.get(attr)
                    if v is not None:
                        names.add(v)
        return names

    def add_paragraph(self, element: E, parent, content_layer=BODY):
        chart_count = self.add_charts(element, parent, content_layer)
        images = element.get_images()
        image_count = self.add_images(
            images, parent, content_layer,
            skip_object_replacements=chart_count > 0)
        runs = text_runs(element, self.pkg)
        text = text_from_runs(runs)
        if images:
            stripped = _strip_image_refs(text, images).strip()
            if stripped != text:
                runs = [Run(stripped)] if stripped else []
                text = stripped
        if image_count > 0 and _strip_image_refs(text, images).strip() == "":
            return
        if chart_count > 0 and ("ObjectReplacements" in text or not text):
            return
        style_names = self.paragraph_style_names(element)
        if "Title" in style_names:
            self.add_runs(runs, "title", parent, content_layer)
        elif "Subtitle" in style_names:
            text = text_from_runs(runs)
            if text:
                norm = normalize_runs(runs)
                self.doc.add_heading(
                    parent=parent, text=text, level=1,
                    content_layer=content_layer,
                    formatting=norm[0].formatting if len(norm) == 1
                    else None)
        else:
            self.add_runs(runs, "text", parent, content_layer)

    # -- images -------------------------------------------------------------
    def add_images(self, images: list[E], parent, content_layer=BODY,
                   skip_object_replacements: bool = False) -> int:
        from .multimodal import decode_image_header
        import base64
        count = 0
        for image in images:
            href = _image_href(image)
            if skip_object_replacements and href is not None:
                if href.removeprefix("./").startswith(
                        "ObjectReplacements/"):
                    continue
            if not _image_can_be_bitmap(image, href):
                continue
            data = self.pkg.get_part(href) if href else None
            if data is None:
                continue
            info = decode_image_header(data)
            if info is None:
                continue  # the reference's PIL.open would raise
            pic = self.doc.add_picture(parent=parent,
                                       content_layer=content_layer)
            # PIL-round-trip re-encode: the reference stores
            # ImageRef.from_pil output, not the source bytes
            # (pngio.encode_png_like_pil is byte-identical to PIL's save)
            from .pngio import reencode_png_like_pil
            payload = reencode_png_like_pil(data) or data
            pic.image = {
                "mimetype": "image/png",
                "dpi": 72,
                "size": {"width": float(info[0]),
                         "height": float(info[1])},
                "uri": ("data:image/png;base64,"
                        + base64.b64encode(payload).decode("ascii")),
            }
            count += 1
        return count

    # -- charts -------------------------------------------------------------
    def add_charts(self, element: E, parent, content_layer=BODY) -> int:
        frames = [element] if element.tag == "draw:frame" else []
        frames.extend(el for el in element.iter_desc("draw:frame"))
        count = 0
        for frame in frames:
            result = self.chart_from_frame(frame)
            if result is None:
                continue
            chart_data, classification = result
            pic = self.doc.add_picture(parent=parent,
                                       content_layer=content_layer)
            pic.meta = {
                "classification": {
                    "predictions": [{"class_name": classification}]},
                "tabular_chart": {"chart_data": chart_data.to_dict()},
            }
            count += 1
        return count

    def chart_from_frame(self, frame: E):
        object_href = None
        for child in frame.children:
            if child.tag == "draw:object":
                object_href = child.get("xlink:href")
                break
        if object_href is None:
            return None
        path = f"{object_href.removeprefix('./').rstrip('/')}/content.xml"
        content = self.pkg.get_part_xml(path)
        if content is None:
            return None
        classification = "other_chart"
        for chart in content.iter_desc("chart:chart"):
            cls = _CHART_CLASS_MAP.get(chart.get("chart:class") or "")
            if cls:
                classification = cls
                break
        else:
            for series in content.iter_desc("chart:series"):
                cls = _CHART_CLASS_MAP.get(series.get("chart:class") or "")
                if cls:
                    classification = cls
                    break
        for table in content.iter_desc("table:table"):
            if table.get("table:name") == "local-table":
                bounds = find_true_data_bounds(table)
                data = table_data_from_odf(table, *bounds)
                if data is not None:
                    return data, classification
        return None

    # -- lists ----------------------------------------------------------------
    def list_level_style(self, odf_list: E, level: int) -> Optional[E]:
        style = self.pkg.get_style("list",
                                   odf_list.get("text:style-name"))
        if style is None:
            return None
        for child in style.children:
            if child.get("text:level") == str(level):
                return child
        return None

    def add_list(self, odf_list: E, parent, content_layer=BODY,
                 enumerated: bool = False, level: int = 1,
                 continued_state: Optional[_ListState] = None,
                 flatten_nested_text: bool = True
                 ) -> Optional[_ListState]:
        """Nested-list walk with style-driven enumeration, start values,
        markers, and sibling continuation
        (opendocument_backend.py:1053-1199)."""
        doc = self.doc
        if not _list_has_renderable(odf_list, flatten_nested_text):
            return None
        level_style = self.list_level_style(odf_list, level)
        style_enumerated = (level_style.tag == "text:list-level-style-number"
                            if level_style is not None else enumerated)
        should_continue = (
            continued_state is not None
            and continued_state.last_item is not None
            and _list_starts_with_empty_nested(odf_list,
                                               flatten_nested_text))
        if not should_continue and not _list_has_direct_text(
                odf_list, flatten_nested_text):
            for child in odf_list.children:
                if child.tag != "text:list-item":
                    continue
                _text, nested = _list_item_content(child,
                                                   flatten_nested_text)
                for nested_list in nested:
                    self.add_list(nested_list, parent, content_layer,
                                  enumerated=style_enumerated,
                                  level=level + 1,
                                  flatten_nested_text=flatten_nested_text)
            return None
        if should_continue and continued_state is not None:
            list_group = continued_state.group
            current_enumerated = continued_state.enumerated
            counter = continued_state.counter
            previous_item = continued_state.last_item
        else:
            list_group = doc.add_list_group(name="list", parent=parent,
                                            content_layer=content_layer)
            current_enumerated = style_enumerated
            counter = self._list_start_value(level_style) - 1
            previous_item = None
        for child in odf_list.children:
            if child.tag != "text:list-item":
                continue
            text, nested = _list_item_content(child, flatten_nested_text)
            nested = [n for n in nested
                      if _list_has_renderable(n, flatten_nested_text)]
            if not text and not nested:
                continue
            if not text:
                nested_parent = previous_item or list_group
                for nested_list in nested:
                    self.add_list(nested_list, nested_parent, content_layer,
                                  enumerated=style_enumerated,
                                  level=level + 1,
                                  flatten_nested_text=flatten_nested_text)
                continue
            counter += 1
            marker = ""
            if current_enumerated:
                suffix = "."
                if level_style is not None:
                    suffix = level_style.get("style:num-suffix") or "."
                marker = f"{counter}{suffix}"
            runs = _list_item_runs(child, self.pkg, flatten_nested_text)
            if len(runs) <= 1:
                item = doc.add_list_item(
                    marker=marker, enumerated=current_enumerated,
                    parent=list_group, text=text,
                    content_layer=content_layer,
                    formatting=runs[0].formatting if runs else None)
            else:
                item = doc.add_list_item(
                    marker=marker, enumerated=current_enumerated,
                    parent=list_group, text="",
                    content_layer=content_layer)
                inline = doc.add_inline_group(parent=item,
                                              content_layer=content_layer)
                for run in runs:
                    doc.add_text(label="text", parent=inline, text=run.text,
                                 content_layer=content_layer,
                                 formatting=run.formatting)
            previous_item = item
            for nested_list in nested:
                self.add_list(nested_list, item, content_layer,
                              enumerated=style_enumerated, level=level + 1,
                              flatten_nested_text=flatten_nested_text)
        return _ListState(list_group, previous_item, current_enumerated,
                          counter)

    @staticmethod
    def _list_start_value(level_style: Optional[E]) -> int:
        if level_style is None:
            return 1
        start = level_style.get("text:start-value")
        if start is None:
            return 1
        try:
            return max(1, int(start))
        except ValueError:
            return 1

    # -- tables ---------------------------------------------------------------
    def add_table(self, table: E, parent, bounds=None, prov=None,
                  content_layer=BODY):
        """Table with covered-cell spans and rich-cell groups
        (opendocument_backend.py:1202-1296)."""
        doc = self.doc
        if bounds is None:
            bounds = find_true_data_bounds(table)
        min_row, max_row, min_col, max_col = bounds
        height = max_row - min_row + 1
        width = max_col - min_col + 1
        if width == 0 or height == 0:
            return None
        data = TableData(num_rows=height, num_cols=width)
        table_item = doc.add_table(parent=parent, data=data,
                                   prov=prov, content_layer=content_layer)
        for row_idx, col_idx, cell in iter_cells(table):
            if not (min_row <= row_idx <= max_row
                    and min_col <= col_idx <= max_col):
                continue
            if cell.tag == "table:covered-table-cell":
                continue
            row_span = int(cell.get("table:number-rows-spanned") or 1)
            col_span = int(cell.get("table:number-columns-spanned") or 1)
            adj_row, adj_col = row_idx - min_row, col_idx - min_col
            text = cell_text(cell)
            kwargs = dict(
                text=text, row_span=row_span, col_span=col_span,
                start_row_offset_idx=adj_row,
                end_row_offset_idx=adj_row + row_span,
                start_col_offset_idx=adj_col,
                end_col_offset_idx=adj_col + col_span,
                column_header=adj_row == 0, row_header=False)
            if cell_is_rich(cell):
                group = doc.add_group(
                    label="unspecified",
                    name=(f"rich_cell_group_{len(doc.tables) - 1}"
                          f"_{adj_col}_{adj_row}"),
                    parent=table_item, content_layer=content_layer)
                for child in cell.children:
                    self.add_child(child, group, content_layer)
                doc.add_table_cell(table_item,
                                   TableCell(**kwargs, ref=group.self_ref))
            else:
                doc.add_table_cell(table_item, TableCell(**kwargs))
        return table_item

    # -- dispatch ---------------------------------------------------------------
    def add_child(self, element: E, parent,
                  content_layer=BODY) -> Optional[_ListState]:
        tag = element.tag
        if tag == "text:h":
            self.add_heading(element, parent, content_layer)
        elif tag == "text:p":
            self.add_paragraph(element, parent, content_layer)
        elif tag == "text:list":
            return self.add_list(element, parent, content_layer,
                                 enumerated=False,
                                 flatten_nested_text=False)
        elif tag == "table:table":
            self.add_table(element, parent, content_layer=content_layer)
        elif tag == "text:section":
            self.add_children(element.children, parent, content_layer)
        elif tag == "draw:frame":
            chart_count = self.add_charts(element, parent, content_layer)
            self.add_images(element.get_images(), parent, content_layer,
                            skip_object_replacements=chart_count > 0)
        else:
            self.add_images(element.get_images(), parent, content_layer)
        return None

    def add_children(self, elements: list[E], parent, content_layer=BODY):
        previous: Optional[_ListState] = None
        for element in elements:
            if element.tag == "text:list":
                previous = self.add_list(
                    element, parent, content_layer, enumerated=False,
                    continued_state=previous, flatten_nested_text=False)
            else:
                previous = None
                self.add_child(element, parent, content_layer)


# ---------------------------------------------------------------------------
# element-level helpers (ported from opendocument_backend.py:513-760)
# ---------------------------------------------------------------------------

def _image_href(image: E) -> Optional[str]:
    return image.get("xlink:href")


def _image_can_be_bitmap(image: E, href: Optional[str]) -> bool:
    mime = image.get("draw:mime-type")
    if mime is not None:
        return mime.startswith("image/") and mime != "image/svg+xml"
    if href is None:
        return False  # no data source at all
    suffix = ("." + href.rsplit(".", 1)[-1].lower()) if "." in \
        href.rsplit("/", 1)[-1] else ""
    if suffix in {".pdf", ".svg", ".emf", ".wmf"}:
        return False
    return suffix in {"", ".bmp", ".gif", ".jpeg", ".jpg", ".png", ".tif",
                      ".tiff", ".webp"}


def _strip_image_refs(text: str, images: list[E]) -> str:
    remaining = text
    for image in images:
        href = _image_href(image)
        if href is None:
            continue
        href = href.strip()
        for ref in {href, href.removeprefix("./")}:
            remaining = remaining.replace(f"({ref})", "")
    return remaining


def element_text_lines(element: E) -> list[str]:
    if element.tag == "text:list":
        lines = []
        for child in element.children:
            if child.tag == "text:list-item":
                lines.extend(element_text_lines(child))
        return lines
    if element.tag == "text:list-item":
        lines = []
        for child in element.children:
            lines.extend(element_text_lines(child))
        if lines:
            return lines
        return _clean_lines(element.text_recursive)
    if element.tag in ("text:h", "text:p"):
        return _clean_lines(element.text_recursive)
    child_lines = []
    for child in element.children:
        child_lines.extend(element_text_lines(child))
    if child_lines:
        return child_lines
    return _clean_lines(element.text_recursive)


def _list_item_content(item: E, flatten_nested_text: bool = True
                       ) -> tuple[str, list[E]]:
    text_parts: list[str] = []
    nested: list[E] = []
    for child in item.children:
        if child.tag == "text:list":
            nested.append(child)
        elif child.tag == "text:p":
            text_parts.extend(_clean_lines(child.text_recursive))
    if not text_parts and (flatten_nested_text or not nested):
        text_parts.extend(_clean_lines(item.text_recursive))
    return " ".join(text_parts), nested


def _list_item_runs(item: E, pkg: OdfPackage,
                    flatten_nested_text: bool = True) -> list[Run]:
    runs: list[Run] = []
    has_nested = False
    for child in item.children:
        if child.tag == "text:list":
            has_nested = True
        elif child.tag == "text:p":
            runs.extend(text_runs(child, pkg))
    if not runs and (flatten_nested_text or not has_nested):
        text = text_from_runs(text_runs(item, pkg))
        if text:
            runs.append(Run(text))
    return normalize_runs(runs)


def _list_starts_with_empty_nested(odf_list: E,
                                   flatten_nested_text: bool) -> bool:
    for child in odf_list.children:
        if child.tag != "text:list-item":
            continue
        text, nested = _list_item_content(child, flatten_nested_text)
        return text == "" and any(
            _list_has_renderable(n, flatten_nested_text) for n in nested)
    return False


def _list_has_direct_text(odf_list: E, flatten_nested_text: bool) -> bool:
    for child in odf_list.children:
        if child.tag != "text:list-item":
            continue
        text, _ = _list_item_content(child, flatten_nested_text)
        if text:
            return True
    return False


def _list_has_renderable(odf_list: E,
                         flatten_nested_text: bool = True) -> bool:
    for child in odf_list.children:
        if child.tag != "text:list-item":
            continue
        text, nested = _list_item_content(child, flatten_nested_text)
        if text or any(_list_has_renderable(n, flatten_nested_text)
                       for n in nested):
            return True
    return False


# -- cells ------------------------------------------------------------------

def iter_rows(table: E):
    """Logical rows (expanding number-rows-repeated, entering header-row
    groups)."""
    def walk(node: E):
        for child in node.children:
            if child.tag == "table:table-row":
                try:
                    repeat = int(child.get(
                        "table:number-rows-repeated") or 1)
                except ValueError:
                    repeat = 1
                for _ in range(min(repeat, 4096)):
                    yield child
            elif child.tag in ("table:table-header-rows",
                               "table:table-rows",
                               "table:table-row-group"):
                yield from walk(child)
    yield from walk(table)


def iter_cells(table: E):
    """(row_idx, col_idx, cell) for every logical grid position, expanding
    column repeats (covered cells included)."""
    for row_idx, row in enumerate(iter_rows(table)):
        col_idx = 0
        for cell in row.children:
            if cell.tag not in ("table:table-cell",
                                "table:covered-table-cell"):
                continue
            try:
                repeat = int(cell.get(
                    "table:number-columns-repeated") or 1)
            except ValueError:
                repeat = 1
            for _ in range(min(repeat, 4096)):
                yield row_idx, col_idx, cell
                col_idx += 1


def cell_value(cell: E):
    """Typed cached cell value (odfdo semantics: numbers as Decimal so
    integral values stringify without '.0')."""
    vtype = cell.get("office:value-type")
    if vtype in ("float", "percentage", "currency"):
        raw = cell.get("office:value")
        if raw is not None:
            try:
                return Decimal(raw)
            except InvalidOperation:
                return raw
    elif vtype == "boolean":
        return cell.get("office:boolean-value") == "true"
    elif vtype == "date":
        return cell.get("office:date-value")
    elif vtype == "time":
        return cell.get("office:time-value")
    elif vtype == "string":
        sv = cell.get("office:string-value")
        if sv is not None:
            return sv
        # odfdo falls back to the joined paragraph texts (never None for
        # string-typed cells)
        return "\n".join(p.text_recursive for p in cell.children
                         if p.tag == "text:p")
    return None


def cell_has_rich_content(cell: E) -> bool:
    if cell.get_images():
        return True
    non_empty_paragraphs = 0
    for child in cell.children:
        if child.tag == "text:list":
            if _list_has_renderable(child):
                return True
        elif child.tag == "text:h":
            if _clean_lines(child.text_recursive):
                return True
        elif child.tag == "text:p":
            if _clean_lines(child.text_recursive):
                non_empty_paragraphs += 1
            if child.get_images():
                return True
        elif child.tag == "table:table":
            if table_has_content(child):
                return True
    return non_empty_paragraphs > 1 or (cell_value(cell) is None
                                        and non_empty_paragraphs > 0)


def _cell_child_text(cell: E) -> str:
    lines: list[str] = []
    for child in cell.children:
        lines.extend(element_text_lines(child))
    return "\n".join(lines)


def cell_text(cell: E) -> str:
    child_text = _cell_child_text(cell)
    if cell_has_rich_content(cell):
        return _strip_image_refs(child_text, cell.get_images())
    value = cell_value(cell)
    if value is not None:
        return str(value)
    if child_text:
        return child_text
    if cell.children:
        return ""
    return "\n".join(_clean_lines(cell.text_recursive))


def cell_has_content(cell: E) -> bool:
    return cell_text(cell) != "" or bool(cell.get_images())


def cell_is_rich(cell: E) -> bool:
    return cell_has_rich_content(cell)


def table_has_content(table: E) -> bool:
    for _r, _c, cell in iter_cells(table):
        if cell.tag == "table:covered-table-cell":
            return True
        if cell_has_content(cell):
            return True
    return False


def find_true_data_bounds(table: E) -> tuple[int, int, int, int]:
    """Smallest rectangle covering content + spans
    (opendocument_backend.py:162-208)."""
    min_row = min_col = None
    max_row = max_col = 0
    for row_idx, col_idx, cell in iter_cells(table):
        if (cell_has_content(cell)
                or cell.tag == "table:covered-table-cell"):
            if min_row is None:
                min_row = row_idx
            if min_col is None or col_idx < min_col:
                min_col = col_idx
            max_row = max(max_row, row_idx)
            max_col = max(max_col, col_idx)
        if cell.tag != "table:covered-table-cell":
            row_span = int(cell.get("table:number-rows-spanned") or 1)
            col_span = int(cell.get("table:number-columns-spanned") or 1)
            if row_span > 1 or col_span > 1:
                if min_row is None:
                    min_row = row_idx
                if min_col is None or col_idx < min_col:
                    min_col = col_idx
                max_row = max(max_row, row_idx + row_span - 1)
                max_col = max(max_col, col_idx + col_span - 1)
    if min_row is None or min_col is None:
        return (0, 0, 0, 0)
    return (min_row, max_row, min_col, max_col)


def table_data_from_odf(table: E, min_row: int, max_row: int,
                        min_col: int, max_col: int) -> Optional[TableData]:
    height = max_row - min_row + 1
    width = max_col - min_col + 1
    if width == 0 or height == 0:
        return None
    cells: list[TableCell] = []
    for row_idx, col_idx, cell in iter_cells(table):
        if not (min_row <= row_idx <= max_row
                and min_col <= col_idx <= max_col):
            continue
        if cell.tag == "table:covered-table-cell":
            continue
        row_span = int(cell.get("table:number-rows-spanned") or 1)
        col_span = int(cell.get("table:number-columns-spanned") or 1)
        adj_row, adj_col = row_idx - min_row, col_idx - min_col
        cells.append(TableCell(
            text=cell_text(cell), row_span=row_span, col_span=col_span,
            start_row_offset_idx=adj_row,
            end_row_offset_idx=adj_row + row_span,
            start_col_offset_idx=adj_col,
            end_col_offset_idx=adj_col + col_span,
            column_header=adj_row == 0, row_header=False))
    return TableData(num_rows=height, num_cols=width, table_cells=cells)


# ---------------------------------------------------------------------------
# per-format converters
# ---------------------------------------------------------------------------

def convert_odt(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0) -> Doc:
    pkg = OdfPackage(data)
    doc = Doc(name, filename=filename or f"{name}.odt",
              binary_hash=binary_hash, mimetype=ODT_MIMETYPE)
    body = pkg.body
    if body is not None:
        OdfConverter(pkg, doc).add_children(
            [c for c in body.children], parent=None)
    return doc


def convert_ods(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0, gap_tolerance: int = 0) -> Doc:
    pkg = OdfPackage(data)
    doc = Doc(name, filename=filename or f"{name}.ods",
              binary_hash=binary_hash, mimetype=ODS_MIMETYPE)
    conv = OdfConverter(pkg, doc)
    body = pkg.body
    if body is None:
        return doc
    page_no = 0
    for sheet in body.children:
        if sheet.tag != "table:table":
            continue
        page_no += 1
        layer = ("invisible" if sheet.get("table:display") == "false"
                 else BODY)
        group = doc.add_group(label="section",
                              name=f"sheet: {sheet.get('table:name') or ''}",
                              content_layer=layer)
        for bounds in _find_sheet_regions(sheet, gap_tolerance):
            min_row, max_row, min_col, max_col = bounds
            prov = [{"page_no": page_no,
                     "bbox": {"l": float(min_col), "t": float(min_row),
                              "r": float(max_col + 1),
                              "b": float(max_row + 1),
                              "coord_origin": "TOPLEFT"},
                     "charspan": [0, 0]}]
            conv.add_table(sheet, group, bounds=bounds, prov=prov,
                           content_layer=layer)
        conv.add_images(sheet.get_images(), group, layer)
        doc.pages[page_no] = _ods_page_size(doc, page_no)
    return doc


def _find_sheet_regions(sheet: E, gap_tolerance: int
                        ) -> list[tuple[int, int, int, int]]:
    """Disconnected data regions via flood fill
    (opendocument_backend.py:1793-1902)."""
    from collections import deque
    bounds = find_true_data_bounds(sheet)
    omin_r, omax_r, omin_c, omax_c = bounds
    cell_map: dict[tuple[int, int], bool] = {}
    for row_idx, col_idx, cell in iter_cells(sheet):
        cell_map[(row_idx, col_idx)] = (
            cell_has_content(cell)
            or cell.tag == "table:covered-table-cell")
    if bounds == (0, 0, 0, 0) and not cell_map.get((0, 0), False):
        return []

    def has_content(r: int, c: int) -> bool:
        if r < omin_r or r > omax_r or c < omin_c or c > omax_c:
            return False
        return cell_map.get((r, c), False)

    regions = []
    visited: set[tuple[int, int]] = set()
    for ri in range(omin_r, omax_r + 1):
        for ci in range(omin_c, omax_c + 1):
            if (ri, ci) in visited or not has_content(ri, ci):
                continue
            cells = {(ri, ci)}
            queue = deque([(ri, ci)])
            min_r = max_r = ri
            min_c = max_c = ci
            while queue:
                cr, cc = queue.popleft()
                min_r, max_r = min(min_r, cr), max(max_r, cr)
                min_c, max_c = min(min_c, cc), max(max_c, cc)
                for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    for step in range(1, gap_tolerance + 2):
                        nr, nc = cr + dr * step, cc + dc * step
                        if (nr, nc) in cells:
                            break
                        if has_content(nr, nc):
                            cells.add((nr, nc))
                            queue.append((nr, nc))
                            break
            visited.update(cells)
            regions.append((min_r, max_r, min_c, max_c))
    return regions


def _ods_page_size(doc: Doc, page_no: int) -> tuple[float, float]:
    left = top = right = bottom = -1.0
    for items in (doc.texts, doc.tables, doc.pictures):
        for item in items:
            for prov in (getattr(item, "prov", None) or []):
                if prov.get("page_no") != page_no:
                    continue
                bbox = prov["bbox"]
                left = min(left, bbox["l"]) if left != -1 else bbox["l"]
                right = max(right, bbox["r"]) if right != -1 else bbox["r"]
                top = min(top, bbox["t"]) if top != -1 else bbox["t"]
                bottom = (max(bottom, bbox["b"]) if bottom != -1
                          else bbox["b"])
    if left == -1 or right == -1:
        return (0.0, 0.0)
    return (right - left, bottom - top)


def convert_odp(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0) -> Doc:
    pkg = OdfPackage(data)
    doc = Doc(name, filename=filename or f"{name}.odp",
              binary_hash=binary_hash, mimetype=ODP_MIMETYPE)
    conv = OdfConverter(pkg, doc)
    body = pkg.body
    if body is None:
        return doc
    slide_idx = -1
    for page in body.children:
        if page.tag != "draw:page":
            continue
        slide_idx += 1
        slide_name = page.get("draw:name") or f"slide-{slide_idx + 1}"
        slide_group = doc.add_group(name=f"slide-{slide_idx}",
                                    label="chapter")
        if not _slide_has_visible_title(page):
            doc.add_text(label="title", parent=slide_group,
                         text=slide_name)
        _walk_slide(conv, page, slide_group)
    return doc


def _is_slide_title_element(element: E, is_first_text: bool) -> bool:
    if element.get("presentation:class") == "title":
        return True
    return is_first_text and element.tag == "draw:custom-shape"


def _slide_has_visible_title(page: E) -> bool:
    seen_text = False
    for element in page.children:
        if element.tag in ("anim:par", "presentation:notes"):
            continue
        if _is_slide_title_element(element, not seen_text):
            return True
        if _clean_lines(element.text_recursive):
            seen_text = True
    return False


def _walk_slide(conv: OdfConverter, page: E, parent) -> None:
    seen_text = False
    for element in page.children:
        if element.tag in ("anim:par", "presentation:notes"):
            continue
        has_text = bool(_clean_lines(element.text_recursive))
        is_title = _is_slide_title_element(element, not seen_text)
        if has_text:
            seen_text = True
        if element.tag == "draw:frame":
            _walk_slide_frame(conv, element, parent, is_title)
        else:
            _walk_textbox_children(conv, element.children, parent, is_title)


def _walk_slide_frame(conv: OdfConverter, frame: E, parent,
                      is_title: bool) -> None:
    chart_count = conv.add_charts(frame, parent)
    for tbl in frame.iter_desc("table:table"):
        conv.add_table(tbl, parent)
    conv.add_images(frame.get_images(), parent,
                    skip_object_replacements=chart_count > 0)
    for textbox in frame.iter_desc("draw:text-box"):
        _walk_textbox_children(conv, textbox.children, parent, is_title)


def _walk_textbox_children(conv: OdfConverter, elements: list[E], parent,
                           is_title: bool = False) -> None:
    previous: Optional[_ListState] = None
    for el in elements:
        if el.tag == "text:h":
            previous = None
            conv.add_heading(el, parent)
        elif el.tag == "text:p":
            previous = None
            conv.add_runs(text_runs(el, conv.pkg),
                          "title" if is_title else "text", parent)
        elif el.tag == "text:list":
            previous = conv.add_list(el, parent, enumerated=False,
                                     continued_state=previous,
                                     flatten_nested_text=False)


def convert_odf(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0) -> Doc:
    """Dispatch on the package's declared type."""
    pkg = OdfPackage(data)
    doc_type = pkg.get_type()
    if doc_type == "spreadsheet":
        return convert_ods(data, name, filename, binary_hash)
    if doc_type == "presentation":
        return convert_odp(data, name, filename, binary_hash)
    return convert_odt(data, name, filename, binary_hash)
