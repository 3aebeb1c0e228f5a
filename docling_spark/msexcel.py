"""MS Excel (xlsx/xlsm) backend: SpreadsheetML -> Doc on stdlib zipfile +
ElementTree.

Reimplements the semantics of the reference's Excel backend
(``/root/reference/docling/backend/msexcel_backend.py``) without openpyxl:

- every sheet (worksheet, chartsheet, hidden or not) becomes a ``sheet``
  group and a 1-based page; hidden sheets land on the ``invisible``
  content layer (msexcel_backend.py:1893).
- contiguous non-empty cell regions are detected with a flood-fill (BFS,
  4-neighborhood, optional gap tolerance) and emitted as tables whose
  first row is the column header; merged cells carry spans and shadow
  cells are skipped (msexcel_backend.py:959-1105).
- a merged single-text leading row adjacent to a >=2-header row is split
  off as a section label text (msexcel_backend.py:780-828).
- drawing images become pictures with cell-coordinate provenance; native
  charts become pictures classified by chart type and carrying the
  chart's data grid re-resolved from the workbook cells
  (msexcel_backend.py:1362-1593).
- cell comments (legacy notes and Excel 365 threaded comments) become
  ``comment_section`` groups on the ``notes`` layer
  (msexcel_backend.py:347-452,713-760).

Cell values reproduce openpyxl's ``data_only=True`` typing: shared/inline
strings, booleans, errors, numbers (int unless '.', 'e' or 'E' appears in
the literal), and date-formatted serials converted via the 1900/1904
epochs. Rendering a cell is ``str(value)`` of that typed value.
"""

from __future__ import annotations

import re
import zipfile
from collections import deque
from datetime import datetime, time, timedelta
from io import BytesIO
from typing import Optional
from xml.etree import ElementTree as ET

from .model import BODY, Doc, TableCell, TableData

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_XDR = ("http://schemas.openxmlformats.org/drawingml/2006/"
           "spreadsheetDrawing")
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_C = "http://schemas.openxmlformats.org/drawingml/2006/chart"
_NS_TC = ("http://schemas.microsoft.com/office/spreadsheetml/2018/"
          "threadedcomments")

_REL_WORKSHEET = _NS_REL + "/worksheet"
_REL_CHARTSHEET = _NS_REL + "/chartsheet"
_REL_DRAWING = _NS_REL + "/drawing"
_REL_CHART = _NS_REL + "/chart"
_REL_IMAGE = _NS_REL + "/image"
_REL_COMMENTS = _NS_REL + "/comments"

XLSX_MIMETYPE = ("application/vnd.openxmlformats-officedocument."
                 "spreadsheetml.sheet")

# chart XML tag (c: namespace localname) -> picture classification
# (msexcel_backend.py:106-117)
_CHART_CLASSIFICATION = {
    "barChart": "bar_chart",
    "bar3DChart": "bar_chart",
    "lineChart": "line_chart",
    "line3DChart": "line_chart",
    "pieChart": "pie_chart",
    "pie3DChart": "pie_chart",
    "doughnutChart": "pie_chart",
    "scatterChart": "scatter_chart",
    "areaChart": "other_chart",
    "area3DChart": "other_chart",
}
_CHART_TAGS = set(_CHART_CLASSIFICATION) | {"radarChart", "stockChart",
                                            "surfaceChart", "bubbleChart"}

# ---------------------------------------------------------------------------
# value typing (openpyxl data_only semantics)
# ---------------------------------------------------------------------------

_WINDOWS_EPOCH = datetime(1899, 12, 30)
_MAC_EPOCH = datetime(1904, 1, 1)

# built-in number-format ids that are date/time formats (ECMA-376 18.8.30)
_BUILTIN_DATE_IDS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + list(range(45, 48))
    + list(range(50, 59)) + list(range(71, 82)))

_BUILTIN_FORMATS = {45: "mm:ss", 46: "[h]:mm:ss", 47: "mmss.0"}

# strip quoted literals / bracketed sections before probing for date tokens
_FMT_STRIP_RE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.')
_DATE_TOKEN_RE = re.compile(r"[dmhys]", re.I)
_TIMEDELTA_FMT_RE = re.compile(r"\[h+\]|\[m+\]|\[s+\]", re.I)


def _is_date_format(fmt: Optional[str]) -> bool:
    if not fmt:
        return False
    fmt = fmt.split(";")[0]
    return _DATE_TOKEN_RE.search(_FMT_STRIP_RE.sub("", fmt)) is not None


def _from_excel_serial(value: float, epoch: datetime, fmt: str):
    """Excel serial -> datetime/time (openpyxl ``from_excel`` semantics)."""
    if _TIMEDELTA_FMT_RE.search(fmt.split(";")[0]):
        td = timedelta(days=value)
        if td.microseconds:
            td = timedelta(seconds=int(td.total_seconds()),
                           microseconds=round(td.microseconds, -3))
        return td
    day, fraction = divmod(value, 1)
    seconds = round(fraction * 86400, 3)
    part = timedelta(seconds=seconds)
    if 0 < abs(value) < 1:
        # pure time-of-day serial
        return (datetime.min + part).time()
    if 0 < value < 60 and epoch is _WINDOWS_EPOCH:
        day += 1  # Excel's phantom 1900-02-29
    return epoch + timedelta(days=day) + part


def _cast_number(text: str):
    if "." in text or "E" in text or "e" in text:
        return float(text)
    return int(text)


def _cell_ref_to_rc(ref: str) -> tuple[int, int]:
    """'B7' -> (row0, col0), both 0-based."""
    m = re.match(r"\$?([A-Z]+)\$?(\d+)", ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)) - 1, col - 1


def _rc_to_coordinate(row0: int, col0: int) -> str:
    col = col0 + 1
    letters = ""
    while col:
        col, rem = divmod(col - 1, 26)
        letters = chr(65 + rem) + letters
    return f"{letters}{row0 + 1}"


def _range_bounds(cell_range: str) -> tuple[int, int, int, int]:
    """'$B$2:$B$7' -> (min_row0, min_col0, max_row0, max_col0), 0-based."""
    parts = cell_range.split(":")
    r1, c1 = _cell_ref_to_rc(parts[0])
    r2, c2 = _cell_ref_to_rc(parts[-1]) if len(parts) > 1 else (r1, c1)
    return min(r1, r2), min(c1, c2), max(r1, r2), max(c1, c2)


# ---------------------------------------------------------------------------
# package parsing
# ---------------------------------------------------------------------------

def _parse_rels(zf: zipfile.ZipFile, part: str) -> dict[str, tuple[str, str]]:
    """rels for a part: rel id -> (type, resolved zip path)."""
    folder, _, name = part.rpartition("/")
    rels_path = f"{folder}/_rels/{name}.rels" if folder else f"_rels/{name}.rels"
    out: dict[str, tuple[str, str]] = {}
    if rels_path not in zf.namelist():
        return out
    root = ET.fromstring(zf.read(rels_path))
    for rel in root.findall(f"{{{_NS_PKGREL}}}Relationship"):
        target = rel.get("Target", "")
        if rel.get("TargetMode") == "External":
            resolved = target
        elif target.startswith("/"):
            # package-absolute target
            resolved = target.lstrip("/")
        else:
            base = folder
            t = target
            while t.startswith("../"):
                t = t[3:]
                base = base.rpartition("/")[0]
            resolved = f"{base}/{t}" if base else t
            resolved = resolved.lstrip("/")
        out[rel.get("Id", "")] = (rel.get("Type", ""), resolved)
    return out


class _Sheet:
    __slots__ = ("name", "state", "is_chartsheet", "part", "cells", "merged",
                 "comments", "images", "charts", "index_in_worksheets")

    def __init__(self, name: str, state: str, is_chartsheet: bool, part: str):
        self.name = name
        self.state = state                  # visible | hidden | veryHidden
        self.is_chartsheet = is_chartsheet
        self.part = part
        self.cells: dict[tuple[int, int], object] = {}  # (row0,col0)->typed
        self.merged: list[tuple[int, int, int, int]] = []  # r0,c0,r1,c1 0-based
        # (row0, col0) -> (author, text) for legacy notes, doc order
        self.comments: dict[tuple[int, int], tuple[str, str]] = {}
        # images/charts in drawing document order:
        self.images: list[tuple[tuple[int, int, int, int], str, bytes]] = []
        self.charts: list[dict] = []
        self.index_in_worksheets = 0        # 1-based among worksheets only


class XlsxWorkbook:
    """Minimal SpreadsheetML reader exposing typed cached cell values."""

    def __init__(self, data: bytes):
        self.zf = zipfile.ZipFile(BytesIO(data))
        names = set(self.zf.namelist())
        if any(n.startswith("/") or ".." in n for n in names):
            raise ValueError("unsafe zip paths")
        self.shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            self._parse_shared_strings()
        self.num_fmts: dict[int, str] = {}
        self.xf_fmt_ids: list[int] = []
        if "xl/styles.xml" in names:
            self._parse_styles()
        self.epoch = _WINDOWS_EPOCH
        self.sheets: list[_Sheet] = []
        self._parse_workbook()
        ws_counter = 0
        for sheet in self.sheets:
            if not sheet.is_chartsheet:
                ws_counter += 1
                sheet.index_in_worksheets = ws_counter
            self._parse_sheet(sheet)
        self.persons: dict[str, str] = {}
        self.threaded: dict[int, dict[str, tuple[str, str, Optional[str]]]] = {}
        self._parse_threaded_comments()

    # -- package members --------------------------------------------------
    def _parse_shared_strings(self) -> None:
        root = ET.fromstring(self.zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{{{_NS_MAIN}}}si"):
            # concatenate plain + rich-run text, excluding <rPh> phonetics
            text = ""
            for child in si:
                tag = child.tag.rsplit("}", 1)[-1]
                if tag == "t":
                    text += child.text or ""
                elif tag == "r":
                    for t in child.findall(f"{{{_NS_MAIN}}}t"):
                        text += t.text or ""
            self.shared.append(text)

    def _parse_styles(self) -> None:
        root = ET.fromstring(self.zf.read("xl/styles.xml"))
        for nf in root.iter(f"{{{_NS_MAIN}}}numFmt"):
            try:
                self.num_fmts[int(nf.get("numFmtId"))] = nf.get(
                    "formatCode", "")
            except (TypeError, ValueError):
                pass
        cell_xfs = root.find(f"{{{_NS_MAIN}}}cellXfs")
        if cell_xfs is not None:
            for xf in cell_xfs.findall(f"{{{_NS_MAIN}}}xf"):
                try:
                    self.xf_fmt_ids.append(int(xf.get("numFmtId", "0")))
                except ValueError:
                    self.xf_fmt_ids.append(0)

    def _style_is_date(self, style_idx: int) -> tuple[bool, str]:
        if style_idx < 0 or style_idx >= len(self.xf_fmt_ids):
            return False, ""
        fmt_id = self.xf_fmt_ids[style_idx]
        fmt = self.num_fmts.get(fmt_id)
        if fmt is None:
            if fmt_id in _BUILTIN_DATE_IDS:
                return True, _BUILTIN_FORMATS.get(fmt_id, "d")
            return False, ""
        return _is_date_format(fmt), fmt

    def _parse_workbook(self) -> None:
        rels = _parse_rels(self.zf, "xl/workbook.xml")
        root = ET.fromstring(self.zf.read("xl/workbook.xml"))
        pr = root.find(f"{{{_NS_MAIN}}}workbookPr")
        if pr is not None and pr.get("date1904") in ("1", "true"):
            self.epoch = _MAC_EPOCH
        sheets_el = root.find(f"{{{_NS_MAIN}}}sheets")
        for sh in (sheets_el if sheets_el is not None else []):
            rid = sh.get(f"{{{_NS_REL}}}id")
            rel = rels.get(rid)
            if rel is None:
                continue
            rel_type, target = rel
            self.sheets.append(_Sheet(
                name=sh.get("name", ""),
                state=sh.get("state", "visible"),
                is_chartsheet=(rel_type == _REL_CHARTSHEET),
                part=target,
            ))

    # -- sheet content -----------------------------------------------------
    def _parse_sheet(self, sheet: _Sheet) -> None:
        if sheet.part not in self.zf.namelist():
            return
        root = ET.fromstring(self.zf.read(sheet.part))
        rels = _parse_rels(self.zf, sheet.part)
        if not sheet.is_chartsheet:
            self._parse_cells(sheet, root)
            for mc in root.iter(f"{{{_NS_MAIN}}}mergeCell"):
                ref = mc.get("ref", "")
                if ":" in ref:
                    r0, c0, r1, c1 = _range_bounds(ref)
                    sheet.merged.append((r0, c0, r1, c1))
            self._parse_comments(sheet, rels)
        for el in root.iter(f"{{{_NS_MAIN}}}drawing"):
            rel = rels.get(el.get(f"{{{_NS_REL}}}id"))
            if rel is not None:
                self._parse_drawing(sheet, rel[1])

    def _parse_cells(self, sheet: _Sheet, root) -> None:
        data = root.find(f"{{{_NS_MAIN}}}sheetData")
        if data is None:
            return
        for row in data.findall(f"{{{_NS_MAIN}}}row"):
            for c in row.findall(f"{{{_NS_MAIN}}}c"):
                ref = c.get("r")
                if not ref:
                    continue
                r0, c0 = _cell_ref_to_rc(ref)
                ctype = c.get("t", "n")
                value = None
                if ctype == "inlineStr":
                    is_el = c.find(f"{{{_NS_MAIN}}}is")
                    if is_el is not None:
                        value = "".join(
                            t.text or ""
                            for t in is_el.iter(f"{{{_NS_MAIN}}}t"))
                else:
                    v = c.find(f"{{{_NS_MAIN}}}v")
                    if v is None or v.text is None:
                        continue
                    raw = v.text
                    if ctype == "s":
                        try:
                            value = self.shared[int(raw)]
                        except (ValueError, IndexError):
                            value = raw
                    elif ctype == "b":
                        value = raw in ("1", "true")
                    elif ctype in ("str", "e"):
                        value = raw
                    else:  # numeric
                        try:
                            value = _cast_number(raw)
                        except ValueError:
                            value = raw
                        else:
                            is_date, fmt = self._style_is_date(
                                int(c.get("s", "0")))
                            if is_date:
                                try:
                                    value = _from_excel_serial(
                                        float(value), self.epoch, fmt)
                                except (OverflowError, ValueError):
                                    pass
                if value is not None:
                    sheet.cells[(r0, c0)] = value

    # -- comments ----------------------------------------------------------
    def _parse_comments(self, sheet: _Sheet, rels: dict) -> None:
        for rel_type, target in rels.values():
            if rel_type != _REL_COMMENTS or target not in self.zf.namelist():
                continue
            root = ET.fromstring(self.zf.read(target))
            authors = [a.text or "" for a in root.iter(
                f"{{{_NS_MAIN}}}author")]
            for comment in root.iter(f"{{{_NS_MAIN}}}comment"):
                ref = comment.get("ref", "")
                if not ref:
                    continue
                try:
                    author = authors[int(comment.get("authorId", "0"))]
                except (ValueError, IndexError):
                    author = ""
                text_el = comment.find(f"{{{_NS_MAIN}}}text")
                text = "".join(
                    t.text or "" for t in text_el.iter(f"{{{_NS_MAIN}}}t")
                ) if text_el is not None else ""
                sheet.comments[_cell_ref_to_rc(ref)] = (author, text)

    def _parse_threaded_comments(self) -> None:
        names = set(self.zf.namelist())
        if "xl/persons/person.xml" in names:
            root = ET.fromstring(self.zf.read("xl/persons/person.xml"))
            for person in root.iter(f"{{{_NS_TC}}}person"):
                pid, disp = person.get("id"), person.get("displayName")
                if pid and disp:
                    self.persons[pid] = disp
        for sheet in self.sheets:
            if sheet.is_chartsheet:
                continue
            path = (f"xl/threadedComments/threadedComment"
                    f"{sheet.index_in_worksheets}.xml")
            if path not in names:
                continue
            per_cell: dict[str, tuple[str, str, Optional[str]]] = {}
            root = ET.fromstring(self.zf.read(path))
            for tc in root.iter(f"{{{_NS_TC}}}threadedComment"):
                ref = tc.get("ref")
                text_el = tc.find(f"{{{_NS_TC}}}text")
                if not ref or text_el is None:
                    continue
                ts = _format_threaded_ts(tc.get("dT"))
                author = self.persons.get(tc.get("personId"), "Unknown")
                per_cell[ref] = (author, text_el.text or "", ts)
            self.threaded[sheet.index_in_worksheets] = per_cell

    # -- drawings ----------------------------------------------------------
    def _parse_drawing(self, sheet: _Sheet, part: str) -> None:
        if part not in self.zf.namelist():
            return
        root = ET.fromstring(self.zf.read(part))
        rels = _parse_rels(self.zf, part)
        for anchor in root:
            tag = anchor.tag.rsplit("}", 1)[-1]
            if tag == "twoCellAnchor":
                frm = anchor.find(f"{{{_NS_XDR}}}from")
                to = anchor.find(f"{{{_NS_XDR}}}to")
                bbox = (_anchor_int(frm, "col"), _anchor_int(frm, "row"),
                        _anchor_int(to, "col") + 1, _anchor_int(to, "row") + 1)
            elif tag == "oneCellAnchor":
                frm = anchor.find(f"{{{_NS_XDR}}}from")
                c0, r0 = _anchor_int(frm, "col"), _anchor_int(frm, "row")
                bbox = (c0, r0, c0 + 1, r0 + 1)
            else:
                bbox = (0, 0, 0, 0)
            for pic in anchor.iter(f"{{{_NS_XDR}}}pic"):
                for blip in pic.iter(f"{{{_NS_A}}}blip"):
                    rel = rels.get(blip.get(f"{{{_NS_REL}}}embed"))
                    if rel is None or rel[1] not in self.zf.namelist():
                        continue
                    sheet.images.append(
                        (bbox, rel[1], self.zf.read(rel[1])))
            for frame in anchor.iter(f"{{{_NS_XDR}}}graphicFrame"):
                for chart_el in frame.iter(f"{{{_NS_C}}}chart"):
                    rel = rels.get(chart_el.get(f"{{{_NS_REL}}}id"))
                    if rel is None or rel[1] not in self.zf.namelist():
                        continue
                    chart = self._parse_chart(rel[1])
                    if chart is not None:
                        chart["bbox"] = bbox
                        sheet.charts.append(chart)

    def _parse_chart(self, part: str) -> Optional[dict]:
        root = ET.fromstring(self.zf.read(part))
        plot_area = None
        for el in root.iter(f"{{{_NS_C}}}plotArea"):
            plot_area = el
            break
        if plot_area is None:
            return None
        chart_el, tagname = None, None
        for child in plot_area:
            local = child.tag.rsplit("}", 1)[-1]
            if local in _CHART_TAGS:
                chart_el, tagname = child, local
                break
        if chart_el is None:
            return None
        title = self._chart_title(root)
        series = []
        for ser in chart_el.findall(f"{{{_NS_C}}}ser"):
            series.append({
                "tx_ref": _data_source_ref(ser.find(f"{{{_NS_C}}}tx")),
                "tx_literal": _first_text(ser.find(f"{{{_NS_C}}}tx"),
                                          f"{{{_NS_C}}}v"),
                "cat_ref": _data_source_ref(ser.find(f"{{{_NS_C}}}cat")),
                "xval_ref": _data_source_ref(ser.find(f"{{{_NS_C}}}xVal")),
                "val_ref": _data_source_ref(ser.find(f"{{{_NS_C}}}val")),
                "yval_ref": _data_source_ref(ser.find(f"{{{_NS_C}}}yVal")),
            })
        return {"tagname": tagname, "title": title, "series": series}

    @staticmethod
    def _chart_title(root) -> Optional[str]:
        """Flatten the chart title's rich-text runs
        (msexcel_backend.py:1469-1499)."""
        chart = root.find(f"{{{_NS_C}}}chart")
        if chart is None:
            return None
        title = chart.find(f"{{{_NS_C}}}title")
        if title is None:
            return None
        tx = title.find(f"{{{_NS_C}}}tx")
        if tx is None:
            return None
        rich = tx.find(f"{{{_NS_C}}}rich")
        if rich is None:
            return None
        runs = []
        for p in rich.findall(f"{{{_NS_A}}}p"):
            for r in p.findall(f"{{{_NS_A}}}r"):
                t = r.find(f"{{{_NS_A}}}t")
                if t is not None and t.text:
                    runs.append(t.text)
        text = "".join(runs).strip()
        return text or None

    # -- chart data resolution ----------------------------------------------
    def resolve_reference(self, ref: str) -> list[str]:
        """Range reference -> flat row-major list of cell-value strings
        (msexcel_backend.py:1785-1833)."""
        if "!" in ref:
            sheet_part, cell_range = ref.rsplit("!", 1)
            sheet_part = sheet_part.strip()
            if sheet_part.startswith("'") and sheet_part.endswith("'"):
                sheet_part = sheet_part[1:-1].replace("''", "'")
            sheet_name = sheet_part
        else:
            sheet_name = self.sheets[0].name if self.sheets else ""
            cell_range = ref
        target = next((s for s in self.sheets if s.name == sheet_name), None)
        if target is None:
            return []
        try:
            r0, c0, r1, c1 = _range_bounds(cell_range)
        except (AttributeError, ValueError):
            return []
        values = []
        for row in range(r0, r1 + 1):
            for col in range(c0, c1 + 1):
                v = target.cells.get((row, col))
                values.append("" if v is None else str(v))
        return values


def _anchor_int(el, name: str) -> int:
    if el is None:
        return 0
    child = el.find(f"{{{_NS_XDR}}}{name}")
    try:
        return int(child.text)
    except (AttributeError, TypeError, ValueError):
        return 0


def _data_source_ref(el) -> Optional[str]:
    """numRef/strRef formula of a series data source
    (msexcel_backend.py:1759-1783: numRef probed before strRef)."""
    if el is None:
        return None
    for kind in ("numRef", "strRef"):
        ref = el.find(f"{{{_NS_C}}}{kind}")
        if ref is not None:
            f = ref.find(f"{{{_NS_C}}}f")
            if f is not None and f.text:
                return f.text
    return None


def _first_text(el, tag: str) -> Optional[str]:
    if el is None:
        return None
    t = el.find(tag)
    return t.text if t is not None and t.text else None


def _format_threaded_ts(ts: Optional[str]) -> Optional[str]:
    """Threaded-comment dT attr -> isoformat(timespec='milliseconds')."""
    if not ts:
        return None
    normalized = ts.replace("Z", "+00:00")
    try:
        if "." in normalized and "+" in normalized:
            head, rest = normalized.split(".", 1)
            frac, tz = rest.split("+", 1)
            normalized = f"{head}.{frac.ljust(6, '0')[:6]}+{tz}"
        elif "." in normalized:
            head, frac = normalized.split(".", 1)
            normalized = f"{head}.{frac.ljust(6, '0')[:6]}"
        return datetime.fromisoformat(normalized).isoformat(
            timespec="milliseconds")
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# table detection (flood fill)
# ---------------------------------------------------------------------------

class _MergedIndex:
    """0-based merged-cell anchor/shadow index
    (msexcel_backend.py:151-208)."""

    def __init__(self, merged: list[tuple[int, int, int, int]]):
        self.anchor_spans: dict[tuple[int, int], tuple[int, int]] = {}
        self.shadows: set[tuple[int, int]] = set()
        self.bounds: Optional[tuple[int, int, int, int]] = None
        for r0, c0, r1, c1 in merged:
            self.anchor_spans.setdefault((r0, c0),
                                         (r1 - r0 + 1, c1 - c0 + 1))
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    if (r, c) != (r0, c0):
                        self.shadows.add((r, c))
            if self.bounds is None:
                self.bounds = (r0, c0, r1, c1)
            else:
                self.bounds = (min(self.bounds[0], r0),
                               min(self.bounds[1], c0),
                               max(self.bounds[2], r1),
                               max(self.bounds[3], c1))

    def contains(self, r: int, c: int) -> bool:
        return (r, c) in self.shadows or (r, c) in self.anchor_spans

    def span_at(self, r: int, c: int) -> tuple[int, int]:
        return self.anchor_spans.get((r, c), (1, 1))


class ExcelCellOut:
    __slots__ = ("row", "col", "text", "row_span", "col_span")

    def __init__(self, row, col, text, row_span, col_span):
        self.row = row
        self.col = col
        self.text = text
        self.row_span = row_span
        self.col_span = col_span


class ExcelTableOut:
    __slots__ = ("anchor", "num_rows", "num_cols", "data")

    def __init__(self, anchor, num_rows, num_cols, data):
        self.anchor = anchor  # (col0, row0)
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.data = data


def _find_true_data_bounds(sheet: _Sheet, merged: _MergedIndex):
    """Smallest rectangle covering data + merged ranges, 0-based inclusive
    (msexcel_backend.py:830-879)."""
    min_r = min_c = None
    max_r = max_c = -1
    for (r, c) in sheet.cells:
        min_r = r if min_r is None else min(min_r, r)
        min_c = c if min_c is None else min(min_c, c)
        max_r = max(max_r, r)
        max_c = max(max_c, c)
    if merged.bounds is not None:
        br0, bc0, br1, bc1 = merged.bounds
        min_r = br0 if min_r is None else min(min_r, br0)
        min_c = bc0 if min_c is None else min(min_c, bc0)
        max_r = max(max_r, br1)
        max_c = max(max_c, bc1)
    if min_r is None or min_c is None:
        return 0, 0, 0, 0
    return min_r, min_c, max_r, max_c


def find_data_tables(sheet: _Sheet,
                     gap_tolerance: int = 0) -> list[ExcelTableOut]:
    """Flood-fill contiguous data regions into rectangular tables
    (msexcel_backend.py:881-1105)."""
    merged = _MergedIndex(sheet.merged)
    min_r, min_c, max_r, max_c = _find_true_data_bounds(sheet, merged)
    # exclusive 0-based bounds for the fill (= 1-based inclusive max)
    row_limit, col_limit = max_r + 1, max_c + 1
    tables: list[ExcelTableOut] = []
    visited: set[tuple[int, int]] = set()

    def has_content(r: int, c: int) -> bool:
        if r < 0 or c < 0 or r >= row_limit or c >= col_limit:
            return False
        return (r, c) in sheet.cells or merged.contains(r, c)

    for ri in range(min_r, max_r + 1):
        for rj in range(min_c, max_c + 1):
            if sheet.cells.get((ri, rj)) is None or (ri, rj) in visited:
                continue
            table, cells = _flood_fill(sheet, merged, ri, rj, row_limit,
                                       col_limit, gap_tolerance, has_content)
            visited.update(cells)
            tables.append(table)
    return tables


def _flood_fill(sheet, merged, start_row, start_col, row_limit, col_limit,
                gap_tolerance, has_content):
    queue = deque([(start_row, start_col)])
    table_cells = {(start_row, start_col)}
    min_r = max_r = start_row
    min_c = max_c = start_col
    while queue:
        curr_r, curr_c = queue.popleft()
        min_r, max_r = min(min_r, curr_r), max(max_r, curr_r)
        min_c, max_c = min(min_c, curr_c), max(max_c, curr_c)
        for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            for step in range(1, gap_tolerance + 2):
                nr, nc = curr_r + dr * step, curr_c + dc * step
                if (nr, nc) in table_cells:
                    break
                if has_content(nr, nc):
                    table_cells.add((nr, nc))
                    queue.append((nr, nc))
                    break
    data = []
    for ri in range(min_r, max_r + 1):
        for rj in range(min_c, max_c + 1):
            if (ri, rj) in merged.shadows:
                continue
            value = sheet.cells.get((ri, rj))
            row_span, col_span = merged.span_at(ri, rj)
            data.append(ExcelCellOut(
                row=ri - min_r, col=rj - min_c,
                text=str(value) if value is not None else "",
                row_span=row_span, col_span=col_span))
    return ExcelTableOut(anchor=(min_c, min_r),
                         num_rows=max_r + 1 - min_r,
                         num_cols=max_c + 1 - min_c,
                         data=data), table_cells


def split_leading_section_label(table: ExcelTableOut):
    """Detach a merged one-text leading row from a data table
    (msexcel_backend.py:780-828)."""
    if table.num_rows < 2 or table.num_cols < 2:
        return None, table
    first_row = [c for c in table.data if c.row == 0]
    with_text = [c for c in first_row if c.text.strip()]
    if len(with_text) != 1:
        return None, table
    title = with_text[0]
    if (title.col != 0 or title.row_span != 1 or title.col_span <= 1
            or title.col_span > table.num_cols):
        return None, table
    second_row_headers = [c for c in table.data
                          if c.row == 1 and c.text.strip()
                          and c.col_span == 1]
    if len(second_row_headers) < 2:
        return None, table
    data = [ExcelCellOut(c.row - 1, c.col, c.text, c.row_span, c.col_span)
            for c in table.data if c.row > 0]
    return title, ExcelTableOut(
        anchor=(table.anchor[0], table.anchor[1] + 1),
        num_rows=table.num_rows - 1, num_cols=table.num_cols, data=data)


# ---------------------------------------------------------------------------
# image support probing (which images openpyxl+PIL would keep)
# ---------------------------------------------------------------------------

def _image_size(data: bytes) -> Optional[tuple[int, int]]:
    """Pixel size for PIL-readable formats via header decode; None when the
    format needs a real rasterizer (EMF/WMF)."""
    from .multimodal import decode_image_header
    info = decode_image_header(data)
    return (info[0], info[1]) if info is not None else None


def _prov(page_no: int, bbox: tuple) -> dict:
    left, top, right, bottom = bbox
    return {"page_no": page_no,
            "bbox": {"l": float(left), "t": float(top), "r": float(right),
                     "b": float(bottom), "coord_origin": "TOPLEFT"},
            "charspan": [0, 0]}


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def convert_xlsx(data: bytes, name: str = "file", filename: str = "",
                 binary_hash: int = 0, gap_tolerance: int = 0) -> Doc:
    """Excel workbook bytes -> Doc (reference semantics, see module
    docstring)."""
    wb = XlsxWorkbook(data)
    doc = Doc(name, filename=filename or f"{name}.xlsx",
              binary_hash=binary_hash, mimetype=XLSX_MIMETYPE)
    for page_no, sheet in enumerate(wb.sheets, start=1):
        layer = BODY if sheet.state == "visible" else "invisible"
        group = doc.add_group(label="sheet", name=sheet.name,
                              content_layer=layer)
        if not sheet.is_chartsheet:
            _convert_tables(doc, wb, sheet, group, page_no, layer,
                            gap_tolerance)
            _convert_images(doc, sheet, group, page_no, layer)
        _convert_charts(doc, wb, sheet, group, page_no, layer)
        _sort_children_by_top(doc, group, page_no)
        doc.pages[page_no] = _page_size(doc, page_no)
    return doc


def _convert_tables(doc, wb, sheet, group, page_no, layer, gap_tolerance):
    tables = find_data_tables(sheet, gap_tolerance)
    for excel_table in tables:
        title_cell, excel_table = split_leading_section_label(excel_table)
        origin_col, origin_row = excel_table.anchor
        if title_cell is not None:
            doc.add_text(
                label="text", text=title_cell.text, parent=group,
                content_layer=layer,
                prov=[_prov(page_no, (
                    origin_col + title_cell.col, origin_row - 1,
                    origin_col + title_cell.col + title_cell.col_span,
                    origin_row))])
        table_data = TableData(num_rows=excel_table.num_rows,
                               num_cols=excel_table.num_cols)
        for cell in excel_table.data:
            table_data.table_cells.append(TableCell(
                text=cell.text, row_span=cell.row_span,
                col_span=cell.col_span,
                start_row_offset_idx=cell.row,
                end_row_offset_idx=cell.row + cell.row_span,
                start_col_offset_idx=cell.col,
                end_col_offset_idx=cell.col + cell.col_span,
                column_header=cell.row == 0, row_header=False))
        doc.add_table(
            data=table_data, parent=group, content_layer=layer,
            prov=[_prov(page_no, (
                origin_col, origin_row, origin_col + excel_table.num_cols,
                origin_row + excel_table.num_rows))])
    _convert_comments(doc, wb, sheet, page_no)


def _find_cell_item(doc, page_no: int, row: int, col: int):
    """Body item whose bbox contains the 0-based (row, col) cell
    (msexcel_backend.py:1863-1891)."""
    for item, _ in doc.iterate_items():
        prov_list = getattr(item, "prov", None) or []
        for prov in prov_list:
            if prov.get("page_no") != page_no:
                continue
            bbox = prov["bbox"]
            if (bbox["l"] <= col < bbox["r"]
                    and bbox["t"] <= row < bbox["b"]):
                return item
    return None


def _convert_comments(doc, wb, sheet, page_no):
    """Legacy notes + threaded comments -> comment_section groups on the
    notes layer (msexcel_backend.py:713-760)."""
    threaded = wb.threaded.get(sheet.index_in_worksheets, {})
    for (row, col), (author, text) in sheet.comments.items():
        raw_text = text.strip()
        timestamp = None
        coord = _rc_to_coordinate(row, col)
        if coord in threaded:
            author, raw_text, timestamp = threaded[coord]
        elif author.startswith("tc={") and "[Threaded comment]" in raw_text:
            if "Comment:\n" in raw_text:
                raw_text = raw_text.split("Comment:\n", 1)[1].strip()
            author = "Threaded comment"
        if not raw_text:
            continue
        meta_parts = []
        if author:
            meta_parts.append(f"author: {author}")
        if timestamp:
            meta_parts.append(f"time: {timestamp}")
        if meta_parts and raw_text:
            full_text = f"[{', '.join(meta_parts)}]: {raw_text}"
        elif meta_parts:
            full_text = f"[{', '.join(meta_parts)}]"
        else:
            full_text = raw_text
        target = _find_cell_item(doc, page_no, row, col)
        comment_group = doc.add_group(
            label="comment_section",
            name=f"comment-{sheet.name}-{coord}",
            content_layer="notes")
        comment_item = doc.add_text(label="text", text=full_text,
                                    parent=comment_group,
                                    content_layer="notes")
        if target is not None and hasattr(target, "comments"):
            target.comments.append(comment_item.self_ref)


def _convert_images(doc, sheet, group, page_no, layer):
    """Raster images first (PIL-readable in the reference), then EMF/WMF
    (msexcel_backend.py:1317-1360: the LibreOffice pass runs after)."""
    supported, unsupported = [], []
    for bbox, path, blob in sheet.images:
        (supported if _image_size(blob) is not None
         else unsupported).append((bbox, path, blob))
    for bbox, path, blob in supported + unsupported:
        pic = doc.add_picture(parent=group, content_layer=layer,
                              prov=[_prov(page_no, bbox)])
        size = _image_size(blob)
        if size is not None:
            import base64

            from .pngio import reencode_png_like_pil
            # PIL-byte-identical re-encode for PNG sources (matches the
            # reference's ImageRef.from_pil uri exactly); EMF and other
            # non-decodable payloads keep the original bytes
            payload = reencode_png_like_pil(blob) or blob
            pic.image = {
                "mimetype": "image/png",
                "dpi": 72,
                "size": {"width": float(size[0]), "height": float(size[1])},
                "uri": ("data:image/png;base64,"
                        + base64.b64encode(payload).decode("ascii")),
            }


def _convert_charts(doc, wb, sheet, group, page_no, layer):
    for chart in sheet.charts:
        classification = _CHART_CLASSIFICATION.get(chart["tagname"],
                                                   "other_chart")
        table_data = _chart_table_data(wb, chart)
        caption_item = None
        if chart["title"]:
            caption_item = doc.add_text(label="caption", text=chart["title"],
                                        content_layer=layer)
        pic = doc.add_picture(parent=group, caption=caption_item,
                              content_layer=layer,
                              prov=[_prov(page_no, chart["bbox"])])
        meta: dict = {"classification": {
            "predictions": [{"class_name": classification}]}}
        meta["tabular_chart"] = ({"chart_data": table_data.to_dict()}
                                 if table_data is not None else None)
        pic.meta = meta


def _chart_table_data(wb, chart) -> Optional[TableData]:
    """Chart series -> (categories x series) data grid
    (msexcel_backend.py:1501-1593)."""
    series_list = chart["series"]
    if not series_list:
        return None
    categories: list[str] = []
    for ser in series_list:
        cat_ref = ser["cat_ref"] or ser["xval_ref"]
        if cat_ref:
            categories = wb.resolve_reference(cat_ref)
            break
    columns: list[tuple[str, list[str]]] = []
    for ser in series_list:
        value_ref = ser["val_ref"] or ser["yval_ref"]
        values = wb.resolve_reference(value_ref) if value_ref else []
        if ser["tx_ref"]:
            resolved = wb.resolve_reference(ser["tx_ref"])
            sname = resolved[0] if resolved else ""
        elif ser["tx_literal"] is not None:
            sname = str(ser["tx_literal"])
        else:
            sname = ""
        columns.append((sname, values))
    return chart_grid_table(categories, columns)


def chart_grid_table(categories: list[str],
                     columns: list[tuple[str, list[str]]]
                     ) -> Optional[TableData]:
    """Categories-down / one-column-per-series chart data grid (shared by
    the xlsx and docx chart paths; msexcel_backend.py:1546-1593)."""
    num_data_rows = max([len(categories)]
                        + [len(values) for _, values in columns])
    if num_data_rows == 0:
        return None
    td = TableData(num_rows=num_data_rows + 1, num_cols=1 + len(columns))
    headers = [""] + [sname for sname, _ in columns]
    for col_idx, label in enumerate(headers):
        td.table_cells.append(TableCell(
            text=label, row_span=1, col_span=1,
            start_row_offset_idx=0, end_row_offset_idx=1,
            start_col_offset_idx=col_idx, end_col_offset_idx=col_idx + 1,
            column_header=True, row_header=False))
    for data_row in range(num_data_rows):
        row_idx = data_row + 1
        category = categories[data_row] if data_row < len(categories) else ""
        row_texts = [category] + [
            values[data_row] if data_row < len(values) else ""
            for _, values in columns]
        for col_idx, text in enumerate(row_texts):
            td.table_cells.append(TableCell(
                text=text, row_span=1, col_span=1,
                start_row_offset_idx=row_idx, end_row_offset_idx=row_idx + 1,
                start_col_offset_idx=col_idx,
                end_col_offset_idx=col_idx + 1,
                column_header=False, row_header=(col_idx == 0)))
    return td


def _sort_children_by_top(doc, group, page_no) -> None:
    """Stable sort of a sheet group's children by bbox top on this page
    (msexcel_backend.py:599-628)."""
    def top(ref: str) -> float:
        item = doc.resolve(ref)
        for prov in (getattr(item, "prov", None) or []):
            if prov.get("page_no") == page_no:
                return prov["bbox"]["t"]
        return float("inf")

    group.children.sort(key=top)


def _page_size(doc, page_no) -> tuple[float, float]:
    """Page extent = max right/bottom over all items on the page
    (msexcel_backend.py:1835-1861)."""
    width = height = 0.0
    for items in (doc.texts, doc.tables, doc.pictures):
        for item in items:
            for prov in (getattr(item, "prov", None) or []):
                if prov.get("page_no") != page_no:
                    continue
                width = max(width, prov["bbox"]["r"])
                height = max(height, prov["bbox"]["b"])
    return width, height
