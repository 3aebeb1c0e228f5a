"""Legacy binary PowerPoint (.ppt, PowerPoint 97-2003) reader.

The reference converts .ppt via LibreOffice to .pptx and runs its pptx
backend (``docling/backend/legacy_msoffice_backend`` flow, fixture
``tests/data/ppt/sources/legacy_sample.ppt`` with groundtruth
md/itxt/json; the reference's own e2e test compares legacy-format json
with FUZZY bbox tolerance, ``tests/test_backend_legacy_msoffice.py:36``,
because LibreOffice geometry varies across platforms).  This module
does the conversion natively: it parses the [MS-PPT] binary record
stream from the OLE2 container (reusing :class:`legacy.OleFile`) and
synthesizes an in-memory .pptx that ``mspptx.convert_pptx`` then
converts - so every pptx-path behavior (slide chapter groups, title
placeholders, list groups, merged table cells, shape ordering) is
shared, not duplicated.

Parsed structures ([MS-PPT] + [MS-ODRAW], all public):
- OLE2 "PowerPoint Document" stream: top-level record sequence
  (DocumentContainer with DocumentAtom slide size in master units
  [1/576 inch], SlideContainers in document order);
- per slide: PPDrawing OfficeArt tree (DgContainer/SpgrContainer/
  SpContainer), ClientAnchor (8-byte: top,left,right,bottom int16) and
  ChildAnchor (16-byte: left,top,right,bottom int32) rectangles;
- ClientTextbox: TextHeaderAtom (TextTypeEnum: 0 Title / 6 CenterTitle
  map to title placeholders), TextCharsAtom (UTF-16LE) / TextBytesAtom
  (cp1252), StyleTextPropAtom paragraph runs (indent level +
  bulletFlags + bulletChar per [MS-PPT] 2.9.20 TextPFException);
- PP9 shape binary tag ("___PPT9" ProgBinaryTagData blob with
  StyleTextProp9Atom): per-paragraph-run fBulletHasAutoNumber /
  bulletAutoNumberScheme - PowerPoint's only encoding of numbered
  lists in the 97-2003 format;
- tables: an OfficeArt group whose group shape carries tertiary
  property 0x39F (tableProperties, bit 0 = isTable); the child shapes
  are the cells, and the grid (columns, rows, col/row spans) is
  reconstructed from the child anchor rectangles.

Geometry is mapped the way LibreOffice's import does: master units ->
1/100 mm (x * 2540 / 576, truncated) -> EMU (x 360).  This reproduces
the groundtruth provenance to within a few hundred EMU on a 12M-EMU
page - far inside the reference's own fuzzy bbox tolerance for legacy
formats.
"""

from __future__ import annotations

import io
import struct
import zipfile
from xml.sax.saxutils import escape

from .legacy import OleFile

RT_DOCUMENT_ATOM = 0x03E9
RT_SLIDE = 0x03EE
RT_PPDRAWING = 0x040C
RT_TEXT_HEADER = 0x0F9F
RT_TEXT_CHARS = 0x0FA0
RT_TEXT_BYTES = 0x0FA8
RT_STP = 0x0FA1
RT_STP9 = 0x0FAC
RT_CSTRING = 0x0FBA
RT_PROGTAGS = 0x1388
RT_BINTAG = 0x138A

OA_SPGR_CONTAINER = 0xF003
OA_SP_CONTAINER = 0xF004
OA_SPGR = 0xF009
OA_CHILD_ANCHOR = 0xF00F
OA_CLIENT_ANCHOR = 0xF010
OA_CLIENT_DATA = 0xF011
OA_CLIENT_TEXTBOX = 0xF00D
OA_OPT3 = 0xF122

PID_TABLE_PROPERTIES = 0x39F

PPT_MIMETYPE = "application/vnd.ms-powerpoint"


class PptError(ValueError):
    pass


def _records(data: bytes, off: int, end: int):
    """Yield (is_container, instance, rec_type, payload_off, payload_len)."""
    while off + 8 <= end:
        vi, rtype, rlen = struct.unpack_from("<HHI", data, off)
        payload_end = min(off + 8 + rlen, end)
        yield ((vi & 0xF) == 0xF, vi >> 4, rtype, off + 8,
               payload_end - (off + 8))
        off += 8 + rlen


def looks_like_ppt(data: bytes) -> bool:
    if data[:4] != b"\xd0\xcf\x11\xe0":
        return False
    try:
        return OleFile(data).stream("PowerPoint Document") is not None
    except Exception:
        return False


# ------------------------------------------------------------------ text

def _parse_stp_para_runs(stp: bytes, text_len: int):
    """StyleTextPropAtom -> paragraph runs
    [(count, indent_level, bullet: bool|None, autonum_placeholder)].

    Field order per [MS-PPT] 2.9.20 TextPFException; only the fields
    before the ones we consume need exact sizes, the char-run section
    is skipped wholesale (paragraph-level properties end once the run
    counts cover text_len + 1).
    """
    runs = []
    off, covered = 0, 0
    n = len(stp)
    while covered < text_len + 1 and off + 10 <= n:
        count, indent = struct.unpack_from("<IH", stp, off)
        off, bullet = _read_pf(stp, off + 6)
        runs.append((count, indent, bullet))
        covered += count
    return runs


def _read_pf(b: bytes, off: int):
    """Consume one TextPFException starting at its masks field.
    Returns (new_off, bullet True/False/None)."""
    mask = struct.unpack_from("<I", b, off)[0]
    off += 4
    bullet = None
    # bulletFlags: one 16-bit field if any of masks A-D (0xF)
    if mask & 0xF:
        flags = struct.unpack_from("<H", b, off)[0]
        off += 2
        if mask & 0x1:  # fHasBullet valid
            bullet = bool(flags & 0x1)
    if mask & 0x0080:   # bulletChar
        off += 2
    if mask & 0x0010:   # bulletFontRef
        off += 2
    if mask & 0x0040:   # bulletSize
        off += 2
    if mask & 0x0020:   # bulletColor
        off += 4
    if mask & 0x0800:   # textAlignment
        off += 2
    if mask & 0x1000:   # lineSpacing
        off += 2
    if mask & 0x2000:   # spaceBefore
        off += 2
    if mask & 0x4000:   # spaceAfter
        off += 2
    if mask & 0x0100:   # leftMargin
        off += 2
    if mask & 0x0400:   # indent
        off += 2
    if mask & 0x8000:   # defaultTabSize
        off += 2
    if mask & 0x100000:  # tabStops: count + count*4
        cnt = struct.unpack_from("<H", b, off)[0]
        off += 2 + cnt * 4
    if mask & 0x10000:  # fontAlign
        off += 2
    if mask & 0xE0000:  # wrapFlags (charWrap/wordWrap/overflow)
        off += 2
    if mask & 0x200000:  # textDirection
        off += 2
    return off, bullet


def _parse_stp9(blob: bytes):
    """PP9 StyleTextProp9Atom payload -> per-paragraph-run autonumber
    flags [(has_autonum, scheme, start)].  Entry = TextPFException9 +
    TextCFException9 + TextSIException (masks-prefixed each)."""
    out = []
    off, n = 0, len(blob)
    while off + 12 <= n:
        mask = struct.unpack_from("<I", blob, off)[0]
        off += 4
        has_autonum, scheme, start = False, 3, 1  # 3 = arabicPeriod
        if mask & 0x00800000:   # bulletBlipRef
            off += 2
        if mask & 0x02000000:   # fBulletHasAutoNumber
            has_autonum = struct.unpack_from("<h", blob, off)[0] != 0
            off += 2
        if mask & 0x01000000:   # bulletAutoNumberScheme (scheme, start)
            scheme, start = struct.unpack_from("<hh", blob, off)
            off += 4
        # TextCFException9
        if off + 4 > n:
            break
        cf_mask = struct.unpack_from("<I", blob, off)[0]
        off += 4
        if cf_mask:  # unknown char-level fields: cannot size them - stop
            break
        # TextSIException
        if off + 4 > n:
            break
        si_mask = struct.unpack_from("<I", blob, off)[0]
        off += 4
        if si_mask:
            break
        out.append((has_autonum, scheme, start))
    return out


def _pp9_blob(data: bytes, off: int, end: int):
    """StyleTextProp9Atom payload from a ProgTags container anywhere
    under this span (ClientData and ClientTextbox both carry them)."""
    for cont, _i, rt, o, ln in _records(data, off, end):
        if cont and rt != RT_PROGTAGS:
            found = _pp9_blob(data, o, o + ln)
            if found is not None:
                return found
        if rt == RT_PROGTAGS and cont:
            for _c2, _i2, rt2, o2, l2 in _records(data, o, o + ln):
                if rt2 != RT_BINTAG:
                    continue
                name = None
                for _c3, _i3, rt3, o3, l3 in _records(data, o2, o2 + l2):
                    if rt3 == RT_CSTRING:
                        name = data[o3:o3 + l3].decode(
                            "utf-16-le", "replace")
                    elif name == "___PPT9":
                        # BinaryTagDataBlob: records, find StyleTextProp9
                        for _c4, _i4, rt4, o4, l4 in _records(
                                data, o3, o3 + l3):
                            if rt4 == RT_STP9:
                                return data[o4:o4 + l4]
    return None


class _Para:
    __slots__ = ("text", "level", "bullet", "autonum")

    def __init__(self, text, level, bullet, autonum):
        self.text = text
        self.level = level
        self.bullet = bullet      # True/False/None (explicit on/off/inherit)
        self.autonum = autonum    # bool


class _Shape:
    __slots__ = ("anchor", "txtype", "paras")

    def __init__(self, anchor, txtype, paras):
        self.anchor = anchor      # (l, t, r, b) master units
        self.txtype = txtype
        self.paras = paras


class _Table:
    __slots__ = ("anchor", "cells")

    def __init__(self, anchor, cells):
        self.anchor = anchor
        self.cells = cells        # [(l, t, r, b, text)] master units


def _shape_text_and_props(data: bytes, off: int, end: int,
                          sp_span: tuple | None = None):
    """ClientTextbox payload -> (txtype, [_Para]).

    sp_span: the enclosing SpContainer's payload span - the PP9
    auto-number extension usually lives in the shape's ClientData
    ProgTags, not inside the ClientTextbox itself.
    """
    txtype = 4
    text = None
    stp = None
    for _cont, _inst, rt, o, ln in _records(data, off, end):
        if rt == RT_TEXT_HEADER and ln >= 4:
            txtype = struct.unpack_from("<I", data, o)[0]
        elif rt == RT_TEXT_CHARS:
            text = data[o:o + ln].decode("utf-16-le", "replace")
        elif rt == RT_TEXT_BYTES:
            text = data[o:o + ln].decode("cp1252", "replace")
        elif rt == RT_STP:
            stp = data[o:o + ln]
    pp9 = _pp9_blob(data, off, end)
    if pp9 is None and sp_span is not None:
        pp9 = _pp9_blob(data, *sp_span)
    if text is None:
        return txtype, []
    runs = _parse_stp_para_runs(stp, len(text)) if stp else []
    autonums = _parse_stp9(pp9) if pp9 else []
    # map each \r-separated paragraph to the STP run covering its start
    paras = []
    bounds = []
    pos = 0
    for ri, (count, _lvl, _b) in enumerate(runs):
        bounds.append((pos, pos + count, ri))
        pos += count
    start = 0
    for ptext in text.split("\r"):
        run = next((r for (a, b, r) in bounds if a <= start < b),
                   len(runs) - 1 if runs else None)
        lvl, bullet, autonum = 0, None, False
        if run is not None and runs:
            count, lvl, bullet = runs[run]
            if run < len(autonums):
                autonum = autonums[run][0]
        paras.append(_Para(ptext, lvl, bullet, autonum))
        start += len(ptext) + 1
    return txtype, paras


# ------------------------------------------------------------------ shapes

def _is_table_group(data: bytes, off: int, end: int) -> bool:
    """True if this group-shape SpContainer carries tableProperties
    (tertiary opt 0x39F) with the isTable bit set."""
    for _cont, inst, rt, o, ln in _records(data, off, end):
        if rt == OA_OPT3:
            p = o
            for _ in range(inst):
                if p + 6 > o + ln:
                    break
                pid = struct.unpack_from("<H", data, p)[0]
                val = struct.unpack_from("<i", data, p + 2)[0]
                if (pid & 0x3FFF) == PID_TABLE_PROPERTIES and (val & 1):
                    return True
                p += 6
    return False


def _client_anchor(data: bytes, off: int, end: int):
    """(l, t, r, b) master units from a ClientAnchor, or None."""
    for _cont, _inst, rt, o, ln in _records(data, off, end):
        if rt == OA_CLIENT_ANCHOR:
            if ln == 8:
                t, l, r, b = struct.unpack_from("<4h", data, o)
                return (l, t, r, b)
            if ln >= 16:
                t, l, r, b = struct.unpack_from("<4i", data, o)
                return (l, t, r, b)
    return None


def _child_anchor(data: bytes, off: int, end: int):
    for _cont, _inst, rt, o, ln in _records(data, off, end):
        if rt == OA_CHILD_ANCHOR and ln >= 16:
            return struct.unpack_from("<4i", data, o)  # (l, t, r, b)
    return None


def _textbox_span(data: bytes, off: int, end: int):
    for cont, _inst, rt, o, ln in _records(data, off, end):
        if rt == OA_CLIENT_TEXTBOX:
            return (o, o + ln)
    return None


def _collect_shapes(data: bytes, off: int, end: int, out: list,
                    xform=None):
    """Walk an SpgrContainer's children into _Shape/_Table entries.

    xform maps group-child coordinates to slide coordinates:
    (sx, ox, sy, oy) with slide = child * s + o.
    """
    items = list(_records(data, off, end))
    for idx, (cont, _inst, rt, o, ln) in enumerate(items):
        if rt == OA_SPGR_CONTAINER:
            # first child SpContainer is the group shape
            sub = list(_records(data, o, o + ln))
            if not sub:
                continue
            _gc, _gi, grt, go, gl = sub[0]
            group_anchor = _client_anchor(data, go, go + gl) \
                or _child_anchor(data, go, go + gl)
            spgr = None
            for _c2, _i2, rt2, o2, l2 in _records(data, go, go + gl):
                if rt2 == OA_SPGR and l2 >= 16:
                    spgr = struct.unpack_from("<4i", data, o2)
            inner_xform = xform
            if group_anchor and spgr and spgr[2] > spgr[0] \
                    and spgr[3] > spgr[1]:
                gl_, gt_, gr_, gb_ = group_anchor
                if xform is not None:
                    sx, ox, sy, oy = xform
                    gl_, gt_ = gl_ * sx + ox, gt_ * sy + oy
                    gr_, gb_ = gr_ * sx + ox, gb_ * sy + oy
                sx = (gr_ - gl_) / (spgr[2] - spgr[0])
                sy = (gb_ - gt_) / (spgr[3] - spgr[1])
                inner_xform = (sx, gl_ - spgr[0] * sx,
                               sy, gt_ - spgr[1] * sy)
            if grt == OA_SP_CONTAINER and _is_table_group(data, go,
                                                          go + gl):
                cells = []
                for _c2, _i2, rt2, o2, l2 in sub[1:]:
                    if rt2 != OA_SP_CONTAINER:
                        continue
                    ca = _child_anchor(data, o2, o2 + l2)
                    # cells carry a ClientTextbox (even when empty);
                    # border line shapes don't and are not cells
                    span = _textbox_span(data, o2, o2 + l2)
                    if ca is None or span is None:
                        continue
                    if inner_xform is not None:
                        sx, ox, sy, oy = inner_xform
                        ca = (ca[0] * sx + ox, ca[1] * sy + oy,
                              ca[2] * sx + ox, ca[3] * sy + oy)
                    _t, paras = _shape_text_and_props(data, *span)
                    text = "\n".join(p.text for p in paras)
                    cells.append((ca[0], ca[1], ca[2], ca[3], text))
                ga = group_anchor
                if ga and xform is not None:
                    sx, ox, sy, oy = xform
                    ga = (ga[0] * sx + ox, ga[1] * sy + oy,
                          ga[2] * sx + ox, ga[3] * sy + oy)
                out.append(_Table(ga or (0, 0, 0, 0), cells))
            else:
                _collect_shapes(data, o, o + ln, out, inner_xform)
        elif rt == OA_SP_CONTAINER:
            anchor = _client_anchor(data, o, o + ln)
            if anchor is None:
                ca = _child_anchor(data, o, o + ln)
                if ca is not None and xform is not None:
                    sx, ox, sy, oy = xform
                    anchor = (ca[0] * sx + ox, ca[1] * sy + oy,
                              ca[2] * sx + ox, ca[3] * sy + oy)
                else:
                    anchor = ca
            span = _textbox_span(data, o, o + ln)
            if span is None:
                continue
            txtype, paras = _shape_text_and_props(data, *span,
                                                  sp_span=(o, o + ln))
            if not any(p.text.strip() for p in paras):
                continue
            out.append(_Shape(anchor or (0, 0, 0, 0), txtype, paras))


class PptFile:
    """Parsed view of one .ppt binary."""

    def __init__(self, data: bytes):
        ole = OleFile(data)
        doc = ole.stream("PowerPoint Document")
        if doc is None:
            raise PptError("no PowerPoint Document stream")
        self.doc = doc
        self.slide_size = (9144, 6858)
        self.slides: list[list] = []
        # per-txtype level-0 bullet default from the main master's
        # TextMasterStyleAtoms (0x0FA3) - paragraphs whose
        # StyleTextPropAtom run does not carry an explicit bulletFlags
        # inherit it (body text defaults to bulleted, "other" doesn't)
        self.default_bullet: dict[int, bool] = {}
        # notes text of each non-master NotesContainer, in stream
        # order; paired positionally with the slides whose SlideAtom
        # carries a non-zero notesIdRef (LibreOffice numbers the two
        # id spaces inconsistently, order is the reliable signal)
        self.notes: list[str] = []
        self.slide_has_notes: list[bool] = []
        for cont, _inst, rt, o, ln in _records(doc, 0, len(doc)):
            if rt == 0x03F8 and cont:  # MainMasterContainer
                for _c2, inst2, rt2, o2, l2 in _records(doc, o, o + ln):
                    if rt2 == 0x0FA3 and l2 >= 8:  # TxMasterStyleAtom
                        p = o2 + 2  # cLevels
                        if inst2 >= 5:
                            p += 2  # 16-bit level number prefix
                        try:
                            _np, bullet = _read_pf(doc, p)
                        except struct.error:
                            continue
                        self.default_bullet[inst2] = bool(bullet)
        for cont, _inst, rt, o, ln in _records(doc, 0, len(doc)):
            if rt == 0x03E8 and cont:  # DocumentContainer
                for _c2, _i2, rt2, o2, l2 in _records(doc, o, o + ln):
                    if rt2 == RT_DOCUMENT_ATOM and l2 >= 8:
                        w, h = struct.unpack_from("<2i", doc, o2)
                        if w > 0 and h > 0:
                            self.slide_size = (w, h)
            elif rt == 0x03F0 and cont:  # NotesContainer
                notes_id = None
                texts: list[str] = []
                for _c2, _i2, rt2, o2, l2 in _records(doc, o, o + ln):
                    if rt2 == 0x03F1 and l2 >= 4:  # NotesAtom
                        notes_id = struct.unpack_from("<i", doc, o2)[0]
                    elif rt2 == RT_PPDRAWING and _c2:
                        inner: list = []
                        for _c3, _i3, rt3, o3, l3 in _records(
                                doc, o2, o2 + l2):
                            if rt3 == 0xF002:
                                for c4 in _records(doc, o3, o3 + l3):
                                    if c4[2] == OA_SPGR_CONTAINER:
                                        _collect_shapes(
                                            doc, c4[3], c4[3] + c4[4],
                                            inner)
                        for sh in inner:
                            if isinstance(sh, _Shape):
                                texts.extend(p.text for p in sh.paras
                                             if p.text.strip())
                # the notes MASTER carries the 0x80000000 persist bit
                if notes_id is not None and notes_id > 0 and texts:
                    self.notes.append("\n".join(texts))
                elif notes_id is not None and notes_id > 0:
                    self.notes.append("")
            elif rt == RT_SLIDE and cont:
                shapes: list = []
                has_notes = False
                for _c2, _i2, rt2, o2, l2 in _records(doc, o, o + ln):
                    if rt2 == 0x03EF and l2 >= 24:  # SlideAtom
                        vals = struct.unpack_from("<6i", doc, o2)
                        has_notes = vals[4] != 0  # notesIdRef
                    if rt2 == RT_PPDRAWING and _c2:
                        # DgContainer -> SpgrContainer
                        for _c3, _i3, rt3, o3, l3 in _records(
                                doc, o2, o2 + l2):
                            if rt3 == 0xF002:  # DgContainer
                                for c4 in _records(doc, o3, o3 + l3):
                                    if c4[2] == OA_SPGR_CONTAINER:
                                        _collect_shapes(
                                            doc, c4[3], c4[3] + c4[4],
                                            shapes)
                for sh in shapes:
                    if isinstance(sh, _Shape):
                        for p in sh.paras:
                            if p.bullet is None:
                                p.bullet = self.default_bullet.get(
                                    sh.txtype, False)
                self.slides.append(shapes)
                self.slide_has_notes.append(has_notes)


# ------------------------------------------------------------- synthesis

def _emu(v: float) -> int:
    """Master units -> EMU via LibreOffice's 1/100 mm intermediate."""
    return int(v * 2540 // 576) * 360


_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.'
    'presentation.main+xml"/>{slides}</Types>')

_CT_SLIDE = (
    '<Override PartName="/ppt/slides/slide{n}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.'
    'slide+xml"/>')

_CT_NOTES = (
    '<Override PartName="/ppt/notesSlides/notesSlide{n}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.'
    'presentationml.notesSlide+xml"/>')

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="ppt/presentation.xml"/></Relationships>')

_P_NS = ('xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/'
         'main" xmlns:r="http://schemas.openxmlformats.org/'
         'officeDocument/2006/relationships" xmlns:p="http://schemas.'
         'openxmlformats.org/presentationml/2006/main"')


def _para_xml(p: _Para) -> str:
    if p.autonum:
        bu = '<a:buAutoNum type="arabicPeriod"/>'
    elif p.bullet:
        bu = '<a:buChar char="•"/>'
    else:
        # explicit off and inherit both render as body paragraphs
        # (LibreOffice writes explicit bulletFlags for every paragraph
        # it exports, so inherit effectively means "no bullet")
        bu = "<a:buNone/>"
    run = f"<a:r><a:t>{escape(p.text)}</a:t></a:r>" if p.text else ""
    return f'<a:p><a:pPr lvl="{p.level}">{bu}</a:pPr>{run}</a:p>'


def _shape_xml(shape: _Shape, sid: int) -> str:
    l, t, r, b = shape.anchor
    x, y = _emu(l), _emu(t)
    cx, cy = max(_emu(r) - x, 0), max(_emu(b) - y, 0)
    ph = ""
    if shape.txtype == 0:
        ph = '<p:ph type="title"/>'
    elif shape.txtype == 6:
        ph = '<p:ph type="ctrTitle"/>'
    paras = "".join(_para_xml(p) for p in shape.paras)
    return (
        f'<p:sp><p:nvSpPr><p:cNvPr id="{sid}" name="Shape {sid}"/>'
        f"<p:cNvSpPr/><p:nvPr>{ph}</p:nvPr></p:nvSpPr>"
        f'<p:spPr><a:xfrm><a:off x="{x}" y="{y}"/>'
        f'<a:ext cx="{cx}" cy="{cy}"/></a:xfrm></p:spPr>'
        f"<p:txBody><a:bodyPr/>{paras}</p:txBody></p:sp>")


def _grid_index(bounds: list, v: float) -> int:
    """Index of the grid boundary nearest v (cells snap exactly here)."""
    return min(range(len(bounds)), key=lambda i: abs(bounds[i] - v))


def _table_xml(table: _Table, sid: int) -> str:
    l, t, r, b = table.anchor
    x, y = _emu(l), _emu(t)
    cx, cy = max(_emu(r) - x, 0), max(_emu(b) - y, 0)
    cells = table.cells
    col_bounds = sorted({c[0] for c in cells} | {max(c[2] for c in cells)})
    row_bounds = sorted({c[1] for c in cells} | {max(c[3] for c in cells)})
    n_cols = len(col_bounds) - 1
    n_rows = len(row_bounds) - 1
    # grid occupancy: lead cell or merge continuation per (row, col)
    grid: dict[tuple, tuple] = {}
    for (cl, ct, cr, cb, text) in cells:
        c0 = _grid_index(col_bounds, cl)
        c1 = _grid_index(col_bounds, cr)
        r0 = _grid_index(row_bounds, ct)
        r1 = _grid_index(row_bounds, cb)
        c1, r1 = max(c1, c0 + 1), max(r1, r0 + 1)
        for ri in range(r0, r1):
            for ci in range(c0, c1):
                kind = ("lead" if (ri, ci) == (r0, c0)
                        else "h" if ri == r0 else "v")
                grid[(ri, ci)] = (kind, text, c1 - c0, r1 - r0)
    rows_xml = []
    for ri in range(n_rows):
        h = max(_emu(row_bounds[ri + 1]) - _emu(row_bounds[ri]), 0)
        tcs = []
        for ci in range(n_cols):
            entry = grid.get((ri, ci))
            if entry is None:
                tcs.append("<a:tc><a:txBody><a:bodyPr/><a:p/></a:txBody>"
                           "</a:tc>")
                continue
            kind, text, cs, rs = entry
            if kind == "lead":
                attrs = ""
                if cs > 1:
                    attrs += f' gridSpan="{cs}"'
                if rs > 1:
                    attrs += f' rowSpan="{rs}"'
                run = (f"<a:r><a:t>{escape(text)}</a:t></a:r>"
                       if text else "")
                tcs.append(f"<a:tc{attrs}><a:txBody><a:bodyPr/>"
                           f"<a:p>{run}</a:p></a:txBody></a:tc>")
            elif kind == "h":
                tcs.append('<a:tc hMerge="1"><a:txBody><a:bodyPr/>'
                           "<a:p/></a:txBody></a:tc>")
            else:
                tcs.append('<a:tc vMerge="1"><a:txBody><a:bodyPr/>'
                           "<a:p/></a:txBody></a:tc>")
        rows_xml.append(f'<a:tr h="{h}">{"".join(tcs)}</a:tr>')
    grid_xml = "".join(
        f'<a:gridCol w="{max(_emu(col_bounds[i + 1]) - _emu(col_bounds[i]), 0)}"/>'
        for i in range(n_cols))
    return (
        f"<p:graphicFrame><p:nvGraphicFramePr>"
        f'<p:cNvPr id="{sid}" name="Table {sid}"/>'
        f"<p:cNvGraphicFramePr/><p:nvPr/></p:nvGraphicFramePr>"
        f'<p:xfrm><a:off x="{x}" y="{y}"/>'
        f'<a:ext cx="{cx}" cy="{cy}"/></p:xfrm>'
        f'<a:graphic><a:graphicData uri="http://schemas.openxmlformats.'
        f'org/drawingml/2006/table"><a:tbl><a:tblGrid>{grid_xml}'
        f'</a:tblGrid>{"".join(rows_xml)}</a:tbl></a:graphicData>'
        f"</a:graphic></p:graphicFrame>")


def synthesize_pptx(ppt: PptFile) -> bytes:
    w, h = ppt.slide_size
    cx = (w * 914400 + 288) // 576
    cy = (h * 914400 + 288) // 576
    slide_rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
        f'openxmlformats.org/officeDocument/2006/relationships/slide" '
        f'Target="slides/slide{i + 1}.xml"/>'
        for i in range(len(ppt.slides)))
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<p:presentation {_P_NS}><p:sldIdLst>"
        + "".join(f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
                  for i in range(len(ppt.slides)))
        + f'</p:sldIdLst><p:sldSz cx="{cx}" cy="{cy}"/></p:presentation>')
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        f'package/2006/relationships">{slide_rels}</Relationships>')
    # pair non-master notes with the slides that declare a notesIdRef
    notes_for_slide: dict[int, str] = {}
    pending = list(ppt.notes)
    for i, has in enumerate(ppt.slide_has_notes):
        if has and pending:
            text = pending.pop(0)
            if text.strip():
                notes_for_slide[i] = text
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        ct_overrides = "".join(
            _CT_SLIDE.format(n=i + 1) for i in range(len(ppt.slides)))
        ct_overrides += "".join(
            _CT_NOTES.format(n=i + 1) for i in sorted(notes_for_slide))
        zf.writestr("[Content_Types].xml", _CT.format(slides=ct_overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("ppt/presentation.xml", pres)
        zf.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i, shapes in enumerate(ppt.slides):
            sid = 2
            parts = []
            for sh in shapes:
                if isinstance(sh, _Table):
                    parts.append(_table_xml(sh, sid))
                else:
                    parts.append(_shape_xml(sh, sid))
                sid += 1
            slide = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f"<p:sld {_P_NS}><p:cSld><p:spTree>"
                '<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/>'
                "<p:nvPr/></p:nvGrpSpPr><p:grpSpPr/>"
                + "".join(parts) + "</p:spTree></p:cSld></p:sld>")
            zf.writestr(f"ppt/slides/slide{i + 1}.xml", slide)
            if i in notes_for_slide:
                paras = "".join(
                    f"<a:p><a:r><a:t>{escape(line)}</a:t></a:r></a:p>"
                    for line in notes_for_slide[i].split("\n"))
                notes = (
                    '<?xml version="1.0" encoding="UTF-8" '
                    f'standalone="yes"?><p:notes {_P_NS}><p:cSld>'
                    '<p:spTree><p:nvGrpSpPr><p:cNvPr id="1" name=""/>'
                    "<p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr><p:grpSpPr/>"
                    '<p:sp><p:nvSpPr><p:cNvPr id="2" name="Notes"/>'
                    '<p:cNvSpPr/><p:nvPr><p:ph type="body" idx="1"/>'
                    "</p:nvPr></p:nvSpPr><p:spPr/><p:txBody><a:bodyPr/>"
                    f"{paras}</p:txBody></p:sp></p:spTree></p:cSld>"
                    "</p:notes>")
                zf.writestr(f"ppt/notesSlides/notesSlide{i + 1}.xml",
                            notes)
                zf.writestr(
                    f"ppt/slides/_rels/slide{i + 1}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" '
                    'standalone="yes"?><Relationships xmlns="http://'
                    'schemas.openxmlformats.org/package/2006/'
                    'relationships"><Relationship Id="rId2" Type='
                    '"http://schemas.openxmlformats.org/officeDocument'
                    '/2006/relationships/notesSlide" Target="../'
                    f'notesSlides/notesSlide{i + 1}.xml"/>'
                    "</Relationships>")
    return buf.getvalue()


def convert_ppt(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0):
    """PowerPoint 97-2003 bytes -> Doc via the shared pptx backend."""
    from .mspptx import convert_pptx
    ppt = PptFile(data)
    pptx_bytes = synthesize_pptx(ppt)
    doc = convert_pptx(pptx_bytes, name=name,
                       filename=filename or f"{name}.ppt",
                       binary_hash=binary_hash)
    doc.mimetype = PPT_MIMETYPE
    return doc
