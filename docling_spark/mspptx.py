"""MS PowerPoint (pptx) backend: PresentationML -> Doc on stdlib zipfile +
ElementTree.

Reimplements the semantics of the reference's PowerPoint backend
(``/root/reference/docling/backend/mspowerpoint_backend.py``) without
python-pptx:

- every slide becomes a ``chapter`` group named ``slide-N`` and a 1-based
  page sized in EMUs (mspowerpoint_backend.py:1234-1242).
- shapes are visited in visual reading order: sorted by top with a
  45720-EMU row tolerance, then left-to-right within a row
  (mspowerpoint_backend.py:618-687); group shapes recurse.
- text frames emit one text item per paragraph; list items are detected
  through the full DrawingML inheritance chain (paragraph properties ->
  shape list style -> layout placeholder -> slide-master text styles,
  mspowerpoint_backend.py:416-590) and grouped into list groups with
  enumerated markers.
- placeholder titles/center-titles become titles, subtitles become
  section headers (mspowerpoint_backend.py:739-757).
- tables keep their grid spans; pictures carry header-decoded sizes;
  native charts become classified pictures with their plotted numbers as
  a data grid; slide notes land on the ``notes`` layer; slide comments
  become ``comment_section`` groups on the ``notes`` layer.

Provenance mirrors the reference exactly: bboxes are raw EMU shape
frames serialized with BOTTOMLEFT origin (the 4-tuple is read as
``(l, b, r, t)``), charspans cover the shape's stripped text, and shapes
without an explicit or inherited frame fall back to the full slide.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from .model import BODY, Doc, TableCell, TableData
from .msexcel import chart_grid_table, _parse_rels

_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_NS_C = "http://schemas.openxmlformats.org/drawingml/2006/chart"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_REL_SLIDE = _NS_R + "/slide"
_REL_LAYOUT = _NS_R + "/slideLayout"
_REL_MASTER = _NS_R + "/slideMaster"
_REL_CHART = _NS_R + "/chart"
_REL_IMAGE = _NS_R + "/image"
_REL_NOTES = _NS_R + "/notesSlide"
_REL_COMMENTS = _NS_R + "/comments"
_REL_COMMENT_AUTHORS = _NS_R + "/commentAuthors"

PPTX_MIMETYPE = ("application/vnd.openxmlformats-officedocument."
                 "presentationml.template")

# 0.05 inch in EMUs: row-grouping tolerance for visual shape ordering
_ROW_TOLERANCE_EMU = 45720
_FALLBACK_POS = 2**63 - 1


def _a(tag):
    return f"{{{_NS_A}}}{tag}"


def _p(tag):
    return f"{{{_NS_P}}}{tag}"


def _c(tag):
    return f"{{{_NS_C}}}{tag}"


# ---------------------------------------------------------------------------
# package
# ---------------------------------------------------------------------------

class PptxPackage:
    def __init__(self, data: bytes):
        self.zf = zipfile.ZipFile(BytesIO(data))
        names = set(self.zf.namelist())
        if any(n.startswith("/") or ".." in n for n in names):
            raise ValueError("unsafe zip paths")
        self.names = names
        # content types: defaults by extension, overrides by part name
        self.ct_default: dict[str, str] = {}
        self.ct_override: dict[str, str] = {}
        ct_root = self._xml("[Content_Types].xml")
        if ct_root is not None:
            ns = "{http://schemas.openxmlformats.org/package/2006/" \
                 "content-types}"
            for el in ct_root:
                if el.tag == f"{ns}Default":
                    self.ct_default[(el.get("Extension") or "").lower()] = \
                        el.get("ContentType", "")
                elif el.tag == f"{ns}Override":
                    self.ct_override[el.get("PartName", "")] = \
                        el.get("ContentType", "")
        pres = self._xml("ppt/presentation.xml")
        if pres is None:
            raise ValueError("not a PresentationML package")
        self.slide_width = 914400
        self.slide_height = 914400
        sz = pres.find(_p("sldSz"))
        if sz is not None:
            self.slide_width = int(sz.get("cx", "914400"))
            self.slide_height = int(sz.get("cy", "914400"))
        rels = _parse_rels(self.zf, "ppt/presentation.xml")
        self.slide_parts: list[str] = []
        lst = pres.find(_p("sldIdLst"))
        for sld in (lst if lst is not None else []):
            rel = rels.get(sld.get(f"{{{_NS_R}}}id"))
            if rel is not None:
                self.slide_parts.append(rel[1])
        # comment authors: id -> (name, initials)
        self.authors: dict[str, tuple[str, str]] = {}
        for rel_type, target in rels.values():
            if rel_type == _REL_COMMENT_AUTHORS and target in names:
                root = ET.fromstring(self.zf.read(target))
                for author in root.findall(_p("cmAuthor")):
                    self.authors[author.get("id", "")] = (
                        author.get("name", ""), author.get("initials", ""))

    def _xml(self, name: str):
        if name not in self.names:
            return None
        try:
            return ET.fromstring(self.zf.read(name))
        except ET.ParseError:
            return None

    def content_type(self, part: str) -> str:
        override = self.ct_override.get("/" + part.lstrip("/"))
        if override is not None:
            return override
        ext = part.rsplit(".", 1)[-1].lower() if "." in part else ""
        return self.ct_default.get(ext, "")


# ---------------------------------------------------------------------------
# shape helpers
# ---------------------------------------------------------------------------

def _xfrm_of(sp) -> Optional[tuple[int, int, int, int]]:
    """(left, top, width, height) from the shape's own frame, or None.

    sp/pic/cxnSp hold it at ``spPr/a:xfrm``, group shapes at
    ``grpSpPr/a:xfrm``, graphic frames directly at ``p:xfrm``.
    """
    xfrm = None
    for props_tag in (_p("spPr"), _p("grpSpPr")):
        props = sp.find(props_tag)
        if props is not None:
            xfrm = props.find(_a("xfrm"))
            break
    if xfrm is None:
        xfrm = sp.find(_p("xfrm"))  # graphicFrame
    if xfrm is None:
        return None
    off, ext = xfrm.find(_a("off")), xfrm.find(_a("ext"))
    if off is None or ext is None:
        return None
    try:
        return (int(off.get("x")), int(off.get("y")),
                int(ext.get("cx")), int(ext.get("cy")))
    except (TypeError, ValueError):
        return None


def _ph_of(sp):
    """The p:ph element of a placeholder shape, or None."""
    nv = sp.find(f".//{_p('nvPr')}")
    return nv.find(_p("ph")) if nv is not None else None


class _Slide:
    """One slide with its layout/master chain resolved."""

    def __init__(self, pkg: PptxPackage, part: str):
        self.pkg = pkg
        self.part = part
        self.root = pkg._xml(part)
        self.rels = _parse_rels(pkg.zf, part)
        self.layout_root = None
        self.master_root = None
        layout_part = next((t for ty, t in self.rels.values()
                            if ty == _REL_LAYOUT), None)
        if layout_part:
            self.layout_root = pkg._xml(layout_part)
            layout_rels = _parse_rels(pkg.zf, layout_part)
            master_part = next((t for ty, t in layout_rels.values()
                                if ty == _REL_MASTER), None)
            if master_part:
                self.master_root = pkg._xml(master_part)

    def layout_placeholder(self, idx: str):
        if self.layout_root is None:
            return None
        for sp in self.layout_root.iter(_p("sp")):
            ph = _ph_of(sp)
            if ph is not None and ph.get("idx", "0") == idx:
                return sp
        return None

    def master_placeholder(self, idx: str):
        if self.master_root is None:
            return None
        for sp in self.master_root.iter(_p("sp")):
            ph = _ph_of(sp)
            if ph is not None and ph.get("idx", "0") == idx:
                return sp
        return None

    def shape_frame(self, sp) -> Optional[tuple[int, int, int, int]]:
        """Shape frame with placeholder inheritance (slide -> layout ->
        master), matching python-pptx's effective-value behavior."""
        frame = _xfrm_of(sp)
        if frame is not None:
            return frame
        ph = _ph_of(sp)
        if ph is None:
            return None
        idx = ph.get("idx", "0")
        for ancestor in (self.layout_placeholder(idx),
                         self.master_placeholder(idx)):
            if ancestor is not None:
                frame = _xfrm_of(ancestor)
                if frame is not None:
                    return frame
        return None

    def master_style_node(self, ph_type: str):
        """p:txStyles bucket for a placeholder type
        (mspowerpoint_backend.py:357-385)."""
        if self.master_root is None:
            return None
        tx_styles = self.master_root.find(f".//{_p('txStyles')}")
        if tx_styles is None:
            return None
        if ph_type in ("body", "obj"):
            return tx_styles.find(_p("bodyStyle"))
        if ph_type == "title":
            return tx_styles.find(_p("titleStyle"))
        return tx_styles.find(_p("otherStyle"))


# ---------------------------------------------------------------------------
# bullet / list inference (mspowerpoint_backend.py:269-590)
# ---------------------------------------------------------------------------

def _parse_bullet_props(pPr):
    if pPr is None:
        return (None, None)
    if pPr.find(_a("buNone")) is not None:
        return (False, "buNone")
    if pPr.find(_a("buChar")) is not None:
        return (True, "buChar")
    if pPr.find(_a("buAutoNum")) is not None:
        return (True, "buAutoNum")
    if pPr.find(_a("buBlip")) is not None:
        return (True, "buBlip")
    return (None, None)


def _lst_style_level(lst_style, lvl: int):
    if lst_style is None:
        return None
    return lst_style.find(_a(f"lvl{lvl + 1}pPr"))


def _paragraph_level(p) -> int:
    pPr = p.find(_a("pPr"))
    if pPr is not None and "lvl" in pPr.attrib:
        try:
            return int(pPr.get("lvl"))
        except ValueError:
            pass
    return 0


def _effective_list_marker(slide: _Slide, sp, p) -> tuple:
    """(is_list, kind) through the 4-stage inheritance chain."""
    lvl = _paragraph_level(p)
    # 1) direct paragraph properties
    is_list, kind = _parse_bullet_props(p.find(_a("pPr")))
    if is_list is not None:
        return is_list, kind
    # 2) shape-level txBody lstStyle
    tx_body = sp.find(f".//{_p('txBody')}")
    if tx_body is not None:
        is_list, kind = _parse_bullet_props(
            _lst_style_level(tx_body.find(_a("lstStyle")), lvl))
        if is_list is not None:
            return is_list, kind
    # 3) layout placeholder lstStyle + 4) master text styles
    ph = _ph_of(sp)
    if ph is not None:
        idx = ph.get("idx", "0")
        layout_result = None
        layout_ph = slide.layout_placeholder(idx)
        if layout_ph is not None:
            layout_tx = layout_ph.find(f".//{_p('txBody')}")
            if layout_tx is not None:
                l_is, l_kind = _parse_bullet_props(
                    _lst_style_level(layout_tx.find(_a("lstStyle")), lvl))
                if l_is is not None:
                    layout_result = (l_is, l_kind)
            style = slide.master_style_node(ph.get("type", "obj"))
            if style is not None:
                m_is, m_kind = _parse_bullet_props(
                    style.find(f".//{_a(f'lvl{lvl + 1}pPr')}"))
                if m_kind in ("buChar", "buAutoNum", "buBlip"):
                    return True, m_kind
                if m_is is not None:
                    return m_is, m_kind
        if layout_result is not None:
            return layout_result
    return None, None


def _is_list_item(slide: _Slide, sp, p) -> tuple[bool, str]:
    is_list, kind = _effective_list_marker(slide, sp, p)
    if is_list is True or kind in ("buChar", "buAutoNum", "buBlip"):
        if kind == "buChar":
            return True, "Bullet"
        if kind == "buAutoNum":
            return True, "Numbered"
        return True, "None"
    if is_list is False:
        return False, "None"
    if _paragraph_level(p) > 0:
        return True, "None"
    return False, "None"


# ---------------------------------------------------------------------------
# text extraction
# ---------------------------------------------------------------------------

def _paragraph_text(p, br_as: str) -> str:
    """Concatenate a paragraph's runs/fields; line breaks become
    ``br_as`` (reference: '\\v' in shape.text, ' ' in emitted items)."""
    parts = []
    for child in p:
        tag = child.tag
        if tag == _a("br"):
            parts.append(br_as)
        elif tag in (_a("r"), _a("fld")):
            t = child.find(_a("t"))
            parts.append(t.text or "" if t is not None else "")
    return "".join(parts)


def _shape_text(sp) -> str:
    """python-pptx ``shape.text``: paragraphs joined with newlines, breaks
    as vertical tabs."""
    tx_body = sp.find(f".//{_p('txBody')}")
    if tx_body is None:
        return ""
    return "\n".join(_paragraph_text(p, "\v")
                     for p in tx_body.findall(_a("p")))


# ---------------------------------------------------------------------------
# shape ordering (mspowerpoint_backend.py:618-687)
# ---------------------------------------------------------------------------

def _iter_shapes_by_position(slide: _Slide, shapes: list) -> list:
    entries = []
    for index, sp in enumerate(shapes):
        frame = slide.shape_frame(sp)
        top = frame[1] if frame is not None else _FALLBACK_POS
        left = frame[0] if frame is not None else _FALLBACK_POS
        entries.append((top, left, index, sp))
    entries.sort(key=lambda e: (e[0], e[2]))
    rows, current, prev_top = [], [], None
    for entry in entries:
        if prev_top is None or entry[0] - prev_top <= _ROW_TOLERANCE_EMU:
            current.append(entry)
            prev_top = entry[0]
        else:
            rows.append(current)
            current = [entry]
            prev_top = entry[0]
    if current:
        rows.append(current)
    out = []
    for row in rows:
        out.extend(e[3] for e in sorted(row, key=lambda e: (e[1], e[2])))
    return out


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

class PptxConverter:
    def __init__(self, data: bytes, name: str, filename: str,
                 binary_hash: int):
        self.pkg = PptxPackage(data)
        self.doc = Doc(name, filename=filename or f"{name}.pptx",
                       binary_hash=binary_hash, mimetype=PPTX_MIMETYPE)

    def convert(self) -> Doc:
        doc = self.doc
        for slide_ind, part in enumerate(self.pkg.slide_parts):
            slide = _Slide(self.pkg, part)
            parent_slide = doc.add_group(label="chapter",
                                         name=f"slide-{slide_ind}")
            doc.pages[slide_ind + 1] = (self.pkg.slide_width,
                                        self.pkg.slide_height)
            if slide.root is None:
                continue
            sp_tree = slide.root.find(f"{_p('cSld')}/{_p('spTree')}")
            if sp_tree is not None:
                shapes = [el for el in sp_tree
                          if el.tag in (_p("sp"), _p("grpSp"),
                                        _p("graphicFrame"), _p("pic"),
                                        _p("cxnSp"))]
                for sp in _iter_shapes_by_position(slide, shapes):
                    self._handle_shape(slide, sp, parent_slide, slide_ind)
            self._handle_notes(slide, parent_slide, slide_ind)
            self._handle_comments(slide, slide_ind)
        return doc

    # -- per-shape dispatch (mspowerpoint_backend.py:1255-1283) ------------
    def _handle_shape(self, slide, sp, parent_slide, slide_ind):
        if sp.tag == _p("grpSp"):
            children = [el for el in sp
                        if el.tag in (_p("sp"), _p("grpSp"),
                                      _p("graphicFrame"), _p("pic"),
                                      _p("cxnSp"))]
            for child in _iter_shapes_by_position(slide, children):
                self._handle_shape(slide, child, parent_slide, slide_ind)
        if sp.find(f".//{_a('tbl')}") is not None:
            self._handle_table(slide, sp, parent_slide, slide_ind)
        if sp.find(f".//{_c('chart')}") is not None:
            self._handle_chart(slide, sp, parent_slide, slide_ind)
        if sp.tag == _p("pic"):
            self._handle_picture(slide, sp, parent_slide, slide_ind)
        text = _shape_text(sp)
        if text.strip():
            self._handle_text(slide, sp, parent_slide, slide_ind)

    def _prov(self, slide, sp, slide_ind, text="") -> dict:
        """EMU provenance; BOTTOMLEFT tuple read as (l, b, r, t)
        (mspowerpoint_backend.py:226-245; falsy left -> full slide)."""
        frame = slide.shape_frame(sp)
        if frame is not None and frame[0]:
            left, top, width, height = frame
        else:
            left, top = 0, 0
            width, height = self.pkg.slide_width, self.pkg.slide_height
        return {"page_no": slide_ind + 1,
                "bbox": {"l": float(left), "t": float(top + height),
                         "r": float(left + width), "b": float(top),
                         "coord_origin": "BOTTOMLEFT"},
                "charspan": [0, len(text)]}

    # -- text / lists (mspowerpoint_backend.py:689-757) --------------------
    def _handle_text(self, slide, sp, parent_slide, slide_ind):
        doc = self.doc
        prov = self._prov(slide, sp, slide_ind, _shape_text(sp).strip())
        tx_body = sp.find(f".//{_p('txBody')}")
        if tx_body is None:
            return
        ph = _ph_of(sp)
        ph_type = ph.get("type", "obj") if ph is not None else None
        list_group = None
        enum_value = 0
        for p in tx_body.findall(_a("p")):
            is_list, bullet_type = _is_list_item(slide, sp, p)
            p_text = _paragraph_text(p, " ")
            if is_list:
                enumerated = bullet_type == "Numbered"
                if list_group is None:
                    list_group = doc.add_list_group(name="list",
                                                    parent=parent_slide)
                    enum_value = 0
                marker = ""
                if enumerated:
                    enum_value += 1
                    marker = f"{enum_value}."
                doc.add_list_item(marker=marker, enumerated=enumerated,
                                  parent=list_group, text=p_text,
                                  prov=[prov])
            else:
                list_group = None
                enum_value = 0
                if ph_type in ("ctrTitle", "title"):
                    doc.add_text(label="title", parent=parent_slide,
                                 text=p_text, prov=[prov])
                else:
                    doc.add_text(label="paragraph", parent=parent_slide,
                                 text=p_text, prov=[prov])

    # -- tables (mspowerpoint_backend.py:815-877) ---------------------------
    def _handle_table(self, slide, sp, parent_slide, slide_ind):
        tbl = sp.find(f".//{_a('tbl')}")
        if tbl is None:
            return
        prov = self._prov(slide, sp, slide_ind)
        rows = tbl.findall(_a("tr"))
        num_rows = len(rows)
        num_cols = 0
        tcells = []
        for row_idx, tr in enumerate(rows):
            cells = tr.findall(_a("tc"))
            num_cols = max(num_cols, len(cells))
            for col_idx, tc in enumerate(cells):
                row_span = int(tc.get("rowSpan", "1"))
                col_span = int(tc.get("gridSpan", "1"))
                text = "\n".join(
                    _paragraph_text(p, "\v")
                    for p in tc.findall(f"{_a('txBody')}/{_a('p')}")
                ).strip()
                if not text:
                    continue
                tcells.append(TableCell(
                    text=text, row_span=row_span, col_span=col_span,
                    start_row_offset_idx=row_idx,
                    end_row_offset_idx=row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=row_idx == 0, row_header=False))
        if tcells:
            data = TableData(num_rows=num_rows, num_cols=num_cols,
                             table_cells=tcells)
            self.doc.add_table(parent=parent_slide, data=data, prov=[prov])

    # -- pictures (mspowerpoint_backend.py:783-813) --------------------------
    def _handle_picture(self, slide, sp, parent_slide, slide_ind):
        from .multimodal import decode_image_header
        blip = sp.find(f".//{_a('blip')}")
        if blip is None:
            return  # missing blipFill: skipped like the reference
        rid = blip.get(f"{{{_NS_R}}}embed")
        rel = slide.rels.get(rid)
        if rel is None or rel[1] not in self.pkg.names:
            return  # dangling relationship
        if not self.pkg.content_type(rel[1]).startswith("image/"):
            return  # wrong declared content type (python-pptx raises)
        blob = self.pkg.zf.read(rel[1])
        info = decode_image_header(blob)
        if info is None:
            return  # undecodable payload
        prov = self._prov(slide, sp, slide_ind)
        pic = self.doc.add_picture(parent=parent_slide, prov=[prov])
        import base64

        from .pngio import reencode_png_like_pil
        # the reference re-encodes via PIL (ImageRef.from_pil); our
        # PIL-byte-identical encoder reproduces its exact data URI for
        # PNG sources (verified vs the pptx json golden); non-PNG
        # payloads keep the original bytes
        payload = reencode_png_like_pil(blob) or blob
        pic.image = {
            "mimetype": "image/png",
            "dpi": _image_dpi(blob),
            "size": {"width": float(info[0]), "height": float(info[1])},
            "uri": ("data:image/png;base64,"
                    + base64.b64encode(payload).decode("ascii")),
        }

    # -- charts (mspowerpoint_backend.py:880-1097) ---------------------------
    def _handle_chart(self, slide, sp, parent_slide, slide_ind):
        chart_el = sp.find(f".//{_c('chart')}")
        rel = slide.rels.get(chart_el.get(f"{{{_NS_R}}}id"))
        if rel is None or rel[1] not in self.pkg.names:
            return
        root = self.pkg._xml(rel[1])
        if root is None:
            return
        plot_area = root.find(f".//{_c('plotArea')}")
        classification = "other_chart"
        series_els: list = []
        if plot_area is not None:
            for child in plot_area:
                local = child.tag.rsplit("}", 1)[-1]
                fam = _classify_plot_tag(local)
                if fam is not None:
                    if not series_els:
                        classification = fam
                    series_els.extend(child.findall(_c("ser")))
        categories: list[str] = []
        for ser in series_els:
            cat = ser.find(_c("cat"))
            if cat is None:
                cat = ser.find(_c("xVal"))
            resolved = _read_cache_values(cat)
            if resolved:
                categories = resolved
                break
        columns = []
        for ser in series_els:
            val = ser.find(_c("val"))
            if val is None:
                val = ser.find(_c("yVal"))
            name_vals = _read_cache_values(ser.find(_c("tx")))
            columns.append((name_vals[0] if name_vals else "",
                            _read_cache_values(val)))
        table_data = chart_grid_table(categories, columns) if columns \
            else None
        caption_text = _chart_title(root)
        prov = self._prov(slide, sp, slide_ind)
        caption_item = None
        if caption_text:
            caption_item = self.doc.add_text(label="caption",
                                             text=caption_text)
        pic = self.doc.add_picture(parent=parent_slide,
                                   caption=caption_item, prov=[prov])
        pic.meta = {
            "classification": {
                "predictions": [{"class_name": classification}]},
            "tabular_chart": ({"chart_data": table_data.to_dict()}
                              if table_data is not None else None),
        }

    # -- notes (mspowerpoint_backend.py:1296-1314) ---------------------------
    def _handle_notes(self, slide, parent_slide, slide_ind):
        notes_part = next((t for ty, t in slide.rels.values()
                           if ty == _REL_NOTES), None)
        if not notes_part:
            return
        root = self.pkg._xml(notes_part)
        if root is None:
            return
        for sp in root.iter(_p("sp")):
            ph = _ph_of(sp)
            if ph is None or ph.get("type") != "body":
                continue
            text = _shape_text(sp).strip()
            if text:
                self.doc.add_text(
                    label="text", parent=parent_slide, text=text,
                    content_layer="notes",
                    prov=[{"page_no": slide_ind + 1,
                           "bbox": {"l": 0.0, "t": 0.0, "r": 0.0, "b": 0.0,
                                    "coord_origin": "TOPLEFT"},
                           "charspan": [0, len(text)]}])
            break

    # -- comments (mspowerpoint_backend.py:1353-1421) ------------------------
    def _handle_comments(self, slide, slide_ind):
        for rel_type, target in slide.rels.values():
            if rel_type != _REL_COMMENTS or target not in self.pkg.names:
                continue
            root = self.pkg._xml(target)
            if root is None:
                continue
            for cm in root.findall(_p("cm")):
                text_el = cm.find(_p("text"))
                raw = (text_el.text or "").strip() \
                    if text_el is not None else ""
                if not raw:
                    continue
                name, initials = self.pkg.authors.get(
                    cm.get("authorId", ""), ("", ""))
                parts = []
                if name:
                    author = f"author: {name}"
                    if initials:
                        author += f" ({initials})"
                    parts.append(author)
                dt = cm.get("dt", "")
                if dt:
                    parts.append(f"time: {dt}")
                prefix = ", ".join(parts)
                full = f"[{prefix}]: {raw}" if prefix else raw
                group = self.doc.add_group(
                    label="comment_section",
                    name=(f"comment-slide{slide_ind + 1}-"
                          f"{cm.get('idx', str(slide_ind))}"),
                    content_layer="notes")
                self.doc.add_text(label="text", text=full, parent=group,
                                  content_layer="notes")


def _image_dpi(blob: bytes) -> int:
    """Horizontal dpi from PNG pHYs / JPEG JFIF density; 72 otherwise
    (matches python-pptx ``image.dpi``)."""
    import struct
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        i = 8
        while i + 8 <= len(blob):
            length = struct.unpack(">I", blob[i:i + 4])[0]
            ctype = blob[i + 4:i + 8]
            if ctype == b"pHYs" and i + 17 <= len(blob):
                ppux, _, unit = struct.unpack(
                    ">IIB", blob[i + 8:i + 17])
                if unit == 1:  # pixels per meter
                    return int(round(ppux * 0.0254))
                return 72
            if ctype == b"IDAT":
                break
            i += 12 + length
        return 72
    if blob[:2] == b"\xff\xd8":
        i = 2
        while i + 4 < len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker == 0xE0 and i + 18 <= len(blob) \
                    and blob[i + 4:i + 9] == b"JFIF\x00":
                unit = blob[i + 11]
                xden = struct.unpack(">H", blob[i + 12:i + 14])[0]
                if unit == 1:
                    return xden or 72
                if unit == 2:  # dots per cm
                    return int(round(xden * 2.54)) or 72
                return 72
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(blob):
                break
            seg_len = struct.unpack(">H", blob[i + 2:i + 4])[0]
            i += 2 + seg_len
    return 72


def _classify_plot_tag(local: str) -> Optional[str]:
    """Chart plot element -> classification family, mirroring the
    XL_CHART_TYPE name matching (mspowerpoint_backend.py:880-907)."""
    if local in ("pieChart", "pie3DChart", "doughnutChart", "ofPieChart"):
        return "pie_chart"
    if local == "scatterChart":
        return "scatter_chart"
    if local in ("lineChart", "line3DChart"):
        return "line_chart"
    if local in ("barChart", "bar3DChart"):
        return "bar_chart"
    if local in ("areaChart", "area3DChart", "radarChart", "surfaceChart",
                 "surface3DChart", "bubbleChart", "stockChart"):
        return "other_chart"
    return None


def _cell_text_float(text: Optional[str], numeric: bool) -> str:
    """python-pptx value semantics: numeric caches round-trip through
    float, integral floats drop the '.0'."""
    if text is None:
        return ""
    if numeric:
        try:
            number = float(text)
        except ValueError:
            return text
        if number.is_integer():
            return str(int(number))
        return str(number)
    return text


def _read_cache_values(node) -> list[str]:
    """pt values under a chart data source; numCache values go through
    float like python-pptx series.values / plot.categories."""
    if node is None:
        return []
    cache = None
    numeric = False
    for tag, is_num in (("numCache", True), ("strCache", False),
                        ("numLit", True), ("strLit", False)):
        cache = node.find(f".//{_c(tag)}")
        if cache is not None:
            numeric = is_num
            break
    if cache is None:
        return []
    points = {}
    for pt in cache.findall(_c("pt")):
        try:
            idx = int(pt.get("idx", "0"))
        except ValueError:
            continue
        v = pt.find(_c("v"))
        points[idx] = _cell_text_float(
            v.text if v is not None else None, numeric)
    if not points:
        return []
    count = 0
    count_el = cache.find(_c("ptCount"))
    if count_el is not None and count_el.get("val"):
        try:
            count = int(count_el.get("val"))
        except ValueError:
            count = 0
    length = max([count] + [i + 1 for i in points])
    return [points.get(i, "") for i in range(length)]


def _chart_title(root) -> Optional[str]:
    chart = root.find(_c("chart"))
    if chart is None:
        return None
    title = chart.find(_c("title"))
    if title is None:
        return None
    runs = [t.text for t in title.iter(_a("t")) if t.text]
    text = "".join(runs).strip()
    return text or None


def convert_pptx(data: bytes, name: str = "file", filename: str = "",
                 binary_hash: int = 0) -> Doc:
    """PowerPoint bytes -> Doc (reference semantics, see module
    docstring)."""
    return PptxConverter(data, name, filename, binary_hash).convert()
