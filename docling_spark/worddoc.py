"""Legacy binary Word (.doc, Word 97-2003) reader.

The reference converts .doc via LibreOffice to .docx and runs its docx
backend (``docling/backend/legacy_msoffice_backend.py``; fixture
``tests/data/doc/legacy_sample.doc`` with groundtruth md/itxt). This
module does the same conversion natively: it parses the [MS-DOC] binary
format from the OLE2 container (reusing :class:`legacy.OleFile`) and
synthesizes an in-memory .docx that mirrors LibreOffice's documented
export conventions, which ``msword.convert_docx`` then converts - so
every docx-path behavior (heading groups, list groups, rich table
cells) is shared, not duplicated.

Parsed structures ([MS-DOC] spec, all public):
- FIB (fcMin/ccpText + FibRgFcLcb97 stream pointers);
- piece table (Clx/PlcPcd) incl. cp1252-compressed and utf-16 pieces;
- PAPX bin table + FKPs (paragraph style istd, sprmPIlfo list refs,
  sprmPFInTable/sprmPFTtp table markers);
- CHPX bin table + FKPs (sprmCFBold/CFItalic runs, sprmCPicLocation,
  sprmCFSpec);
- stylesheet STSH (istd -> style name);
- list tables PlfLfo/PlcfLst (ilfo -> lsid -> LVLF number format);
- Data-stream PICF picture payloads (inline images).

LibreOffice export conventions mirrored (they are what the reference's
groundtruth bakes): style hierarchy Heading <- Title <- Subtitle (so a
Title paragraph resolves as a LEVELLESS heading), "Heading N" styles
carry the invisible chapter-numbering numId (numFmt none), fields
contribute their cached result text only.
"""

from __future__ import annotations

import bisect
import io
import struct
import zipfile
from xml.sax.saxutils import escape

from .legacy import OleFile

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

# sprm opcodes ([MS-DOC] 2.6.1-2.6.4)
SPRM_PISTD = 0x4600
SPRM_PILFO = 0x460B
SPRM_PILVL = 0x260A
SPRM_PFINTABLE = 0x2416
SPRM_PFTTP = 0x2417
SPRM_CFBOLD = 0x0835
SPRM_CFITALIC = 0x0836
SPRM_CFSPEC = 0x0855
SPRM_CPICLOCATION = 0x6A03


class DocError(ValueError):
    pass


def _sprm_operand_len(sprm: int, grp: bytes, i: int) -> int:
    """Operand byte length from the sprm's spra bits ([MS-DOC] 2.2.5.1)."""
    spra = (sprm >> 13) & 7
    if spra in (0, 1):
        return 1
    if spra in (2, 4, 5):
        return 2
    if spra == 7:
        return 3
    if spra == 3:
        return 4
    # spra == 6: variable. The documented exception ([MS-DOC] 2.6.3)
    # is sprmTDefTable/sprmTDefTable10 (0xD608/0xD606): the operand
    # starts with a 2-byte cb = "bytes used by the remainder of this
    # structure, incremented by 1", so the operand spans cb + 1 bytes.
    # Every other spra==6 sprm has a 1-byte size prefix.
    if sprm in (0xD608, 0xD606):
        cb = struct.unpack_from("<H", grp, i)[0]
        return cb + 1
    return 1 + grp[i]


def _iter_sprms(grp: bytes):
    i = 0
    n = len(grp)
    while i + 2 <= n:
        sprm = struct.unpack_from("<H", grp, i)[0]
        i += 2
        ln = _sprm_operand_len(sprm, grp, i)
        yield sprm, grp[i:i + ln]
        i += ln


class DocFile:
    """Parsed view of one .doc binary."""

    def __init__(self, data: bytes):
        ole = OleFile(data)
        wd = ole.stream("WordDocument")
        if wd is None or len(wd) < 64:
            raise DocError("no WordDocument stream")
        if struct.unpack("<H", wd[0:2])[0] != 0xA5EC:
            raise DocError("not a Word binary file")
        flags = struct.unpack("<H", wd[10:12])[0]
        which = "1Table" if (flags >> 9) & 1 else "0Table"
        tbl = ole.stream(which) or b""
        self.wd = wd
        self.tbl = tbl
        self.data_stream = ole.stream("Data") or b""
        csw = struct.unpack("<H", wd[32:34])[0]
        off = 34 + csw * 2
        cslw = struct.unpack("<H", wd[off:off + 2])[0]
        rglw = struct.unpack(f"<{cslw}i", wd[off + 2:off + 2 + cslw * 4])
        self.ccp_text = rglw[3]
        off2 = off + 2 + cslw * 4
        cbr = struct.unpack("<H", wd[off2:off2 + 2])[0]
        self.fclcb = struct.unpack(
            f"<{cbr * 2}I", wd[off2 + 2:off2 + 2 + cbr * 8])
        self._parse_pieces()
        self.paragraphs = self._parse_papx()
        self.runs = self._parse_chpx()
        # CHPX runs are disjoint (each FKP covers a distinct fc range),
        # so a bisect over the sorted starts replaces the linear scan -
        # char_props/run_end_at are O(log R), keeping heavily-formatted
        # multi-MB docs (10^5+ runs) linear overall instead of O(R^2)
        self._run_starts = [a for (a, _, _) in self.runs]
        self.style_names = self._parse_stsh()
        self.lfo_fmt = self._parse_lists()

    def _pair(self, i: int):
        return self.fclcb[2 * i], self.fclcb[2 * i + 1]

    # -- piece table ------------------------------------------------------
    def _parse_pieces(self):
        fc_clx, lcb = self._pair(33)
        clx = self.tbl[fc_clx:fc_clx + lcb]
        i = 0
        while i < len(clx) and clx[i] == 1:  # Prc blocks
            cbg = struct.unpack_from("<h", clx, i + 1)[0]
            i += 3 + cbg
        if i >= len(clx) or clx[i] != 2:
            raise DocError("no piece table")
        lcb_plc = struct.unpack_from("<I", clx, i + 1)[0]
        plc = clx[i + 5:i + 5 + lcb_plc]
        n = (lcb_plc - 4) // 12
        cps = struct.unpack(f"<{n + 1}I", plc[:4 * (n + 1)])
        self.pieces = []
        for k in range(n):
            pcd = plc[4 * (n + 1) + 8 * k:4 * (n + 1) + 8 * k + 8]
            fcraw = struct.unpack("<I", pcd[2:6])[0]
            comp = bool(fcraw & 0x40000000)
            fc = fcraw & 0x3FFFFFFF
            if comp:
                fc //= 2
            self.pieces.append((cps[k], cps[k + 1], fc, comp))

    def text_range(self, cp0: int, cp1: int) -> str:
        out = []
        for (a, b, fc, comp) in self.pieces:
            s, e = max(cp0, a), min(cp1, b)
            if s >= e:
                continue
            if comp:
                out.append(self.wd[fc + (s - a):fc + (e - a)]
                           .decode("cp1252", "replace"))
            else:
                out.append(self.wd[fc + 2 * (s - a):fc + 2 * (e - a)]
                           .decode("utf-16-le", "replace"))
        return "".join(out)

    def fc_to_cp(self, fc_t: int):
        for (a, b, fc, comp) in self.pieces:
            end = fc + (b - a) if comp else fc + 2 * (b - a)
            if fc <= fc_t <= end:
                return a + ((fc_t - fc) if comp else (fc_t - fc) // 2)
        return None

    # -- FKPs -------------------------------------------------------------
    def _bin_table(self, pair_idx: int):
        fcb, lcbb = self._pair(pair_idx)
        if not lcbb:
            return []
        nb = (lcbb - 4) // 8
        base = self.tbl
        pns = struct.unpack(
            f"<{nb}I", base[fcb + 4 * (nb + 1):fcb + 4 * (nb + 1) + 4 * nb])
        return pns

    def _parse_papx(self):
        """-> [(cp0, cp1, istd, grpprl)] for the whole doc in order."""
        out = []
        for pn in self._bin_table(13):
            page = self.wd[pn * 512:(pn + 1) * 512]
            cpara = page[511]
            rgfc = struct.unpack(f"<{cpara + 1}I", page[:4 * (cpara + 1)])
            bx = 4 * (cpara + 1)
            for j in range(cpara):
                boff = page[bx + 13 * j]
                if boff == 0:
                    istd, grp = 0, b""
                else:
                    o = boff * 2
                    cbp = page[o]
                    if cbp == 0:
                        cbp = page[o + 1] * 2
                        o += 2
                    else:
                        cbp = cbp * 2 - 1
                        o += 1
                    px = page[o:o + cbp]
                    istd = struct.unpack_from("<H", px)[0] if len(px) >= 2 \
                        else 0
                    grp = px[2:]
                c0 = self.fc_to_cp(rgfc[j])
                c1 = self.fc_to_cp(rgfc[j + 1])
                if c0 is None or c1 is None:
                    continue
                out.append((c0, c1, istd, grp))
        out.sort()
        return out

    def _parse_chpx(self):
        """-> [(cp0, cp1, {bold, italic, pic_off, special})]."""
        out = []
        for pn in self._bin_table(12):
            page = self.wd[pn * 512:(pn + 1) * 512]
            crun = page[511]
            rgfc = struct.unpack(f"<{crun + 1}I", page[:4 * (crun + 1)])
            for j in range(crun):
                boff = page[4 * (crun + 1) + j]
                grp = b""
                if boff:
                    o = boff * 2
                    grp = page[o + 1:o + 1 + page[o]]
                props = {}
                for sprm, opd in _iter_sprms(grp):
                    if sprm == SPRM_CFBOLD and opd and opd[0] in (1, 0x81):
                        props["bold"] = True
                    elif sprm == SPRM_CFITALIC and opd \
                            and opd[0] in (1, 0x81):
                        props["italic"] = True
                    elif sprm == SPRM_CPICLOCATION and len(opd) == 4:
                        props["pic_off"] = struct.unpack("<I", opd)[0]
                    elif sprm == SPRM_CFSPEC and opd and opd[0] == 1:
                        props["special"] = True
                c0 = self.fc_to_cp(rgfc[j])
                c1 = self.fc_to_cp(rgfc[j + 1])
                if c0 is None or c1 is None:
                    continue
                out.append((c0, c1, props))
        out.sort()
        return out

    def char_props(self, cp: int) -> dict:
        j = bisect.bisect_right(self._run_starts, cp) - 1
        if 0 <= j < len(self.runs):
            a, b, props = self.runs[j]
            if a <= cp < b:
                return props
        return {}

    def run_end_at(self, cp: int) -> int | None:
        """End cp of the run covering ``cp`` (None if uncovered)."""
        j = bisect.bisect_right(self._run_starts, cp) - 1
        if 0 <= j < len(self.runs):
            a, b, _ = self.runs[j]
            if a <= cp < b:
                return b
        return None

    # -- stylesheet -------------------------------------------------------
    def _parse_stsh(self):
        fc, lcb = self._pair(1)
        st = self.tbl[fc:fc + lcb]
        if len(st) < 6:
            return {}
        cb_stshi = struct.unpack_from("<H", st)[0]
        cstd, cb_base = struct.unpack_from("<HH", st, 2)
        names = {}
        p = 2 + cb_stshi
        for istd in range(cstd):
            if p + 2 > len(st):
                break
            cb_std = struct.unpack_from("<H", st, p)[0]
            p += 2
            if cb_std:
                std = st[p:p + cb_std]
                if len(std) > cb_base + 2:
                    ln = struct.unpack_from("<H", std, cb_base)[0]
                    nm = std[cb_base + 2:cb_base + 2 + 2 * ln].decode(
                        "utf-16-le", "replace")
                    names[istd] = nm
                p += cb_std
            if p % 2:
                p += 1
        return names

    # -- list tables ------------------------------------------------------
    def _parse_lists(self):
        """-> {ilfo: numfmt} with numfmt 'bullet' or 'decimal'."""
        fc_lst, lcb_lst = self._pair(73)
        fc_lfo, lcb_lfo = self._pair(74)
        if not lcb_lst or not lcb_lfo:
            return {}
        tbl = self.tbl
        c_lst = struct.unpack_from("<H", tbl, fc_lst)[0]
        lists = []  # (lsid, fSimpleList)
        p = fc_lst + 2
        for _ in range(c_lst):
            lsid = struct.unpack_from("<i", tbl, p)[0]
            fsimple = bool(tbl[p + 26] & 1)
            lists.append((lsid, fsimple))
            p += 28
        # LVLFs follow all LSTFs: 1 level for simple lists, 9 otherwise
        lvl0_fmt = {}
        for (lsid, fsimple) in lists:
            nlvl = 1 if fsimple else 9
            for ilvl in range(nlvl):
                start, nfc = struct.unpack_from("<iB", tbl, p)
                # LVLF is 28 bytes (cbGrpprlChpx at +24, cbGrpprlPapx at
                # +25), then grpprlPapx, grpprlChpx, xst
                cb_chpx = tbl[p + 24]
                cb_papx = tbl[p + 25]
                q = p + 28 + cb_chpx + cb_papx
                xst_len = struct.unpack_from("<H", tbl, q)[0]
                if ilvl == 0:
                    lvl0_fmt[lsid] = "bullet" if nfc == 0x17 else "decimal"
                p = q + 2 + 2 * xst_len
        # LFOs
        c_lfo = struct.unpack_from("<I", tbl, fc_lfo)[0]
        out = {}
        p = fc_lfo + 4
        for ilfo in range(1, c_lfo + 1):
            lsid = struct.unpack_from("<i", tbl, p)[0]
            out[ilfo] = lvl0_fmt.get(lsid, "decimal")
            p += 16
        return out

    # -- pictures ---------------------------------------------------------
    def picture(self, pic_off: int):
        """PICF at Data offset -> (ext, image bytes) or None."""
        d = self.data_stream
        if pic_off + 14 > len(d):
            return None
        lcb = struct.unpack_from("<I", d, pic_off)[0]
        blob = d[pic_off:pic_off + lcb]
        for sig, ext in ((b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"),
                         (b"GIF8", "gif")):
            i = blob.find(sig)
            if i >= 0:
                return ext, blob[i:]
        return None


# ----------------------------------------------------------- docx synth

_STYLE_XML = """<w:style w:type="paragraph" w:styleId="{sid}">
<w:name w:val="{name}"/>{based}</w:style>"""


def _style_id(name: str) -> str:
    return "".join(ch for ch in name if ch.isalnum()) or "Normal"


def _heading_level(name: str):
    """'Heading 3' -> 3, else None."""
    parts = name.rsplit(" ", 1)
    if len(parts) == 2 and parts[0].lower() == "heading" \
            and parts[1].isdigit():
        return int(parts[1])
    return None


def doc_to_docx(data: bytes) -> bytes:
    """Binary .doc -> in-memory .docx zip (LibreOffice-convention
    export; see module docstring)."""
    doc = DocFile(data)
    styles_used: dict[str, str] = {}     # styleId -> display name
    numbering_used: dict[int, str] = {}  # numId -> numfmt
    CHAPTER_NUM = 9000                   # invisible heading numbering
    media: list[tuple[str, bytes]] = []
    rels: list[str] = []

    def style_for(istd: int) -> tuple[str, bool]:
        """-> (styleId, is_heading_n)."""
        name = doc.style_names.get(istd, "Normal")
        sid = _style_id(name)
        styles_used[sid] = name
        return sid, _heading_level(name) is not None

    def run_xml(text: str, props: dict) -> str:
        rpr = ""
        if props.get("bold") or props.get("italic"):
            rpr = ("<w:rPr>" + ("<w:b/>" if props.get("bold") else "")
                   + ("<w:i/>" if props.get("italic") else "") + "</w:rPr>")
        return (f"<w:r>{rpr}<w:t xml:space=\"preserve\">"
                f"{escape(text)}</w:t></w:r>")

    def drawing_xml(pic_off: int) -> str:
        got = doc.picture(pic_off)
        if got is None:
            return ""
        ext, img = got
        idx = len(media) + 1
        fn = f"image{idx}.{ext}"
        media.append((fn, img))
        rid = f"rIdImg{idx}"
        rels.append(
            f'<Relationship Id="{rid}" Type="http://schemas.openxml'
            f'formats.org/officeDocument/2006/relationships/image" '
            f'Target="media/{fn}"/>')
        return (
            '<w:r><w:drawing><wp:inline xmlns:wp="http://schemas.openxml'
            'formats.org/drawingml/2006/wordprocessingDrawing">'
            '<wp:extent cx="952500" cy="952500"/>'
            '<a:graphic xmlns:a="http://schemas.openxmlformats.org/'
            'drawingml/2006/main"><a:graphicData uri="http://schemas.'
            'openxmlformats.org/drawingml/2006/picture">'
            '<pic:pic xmlns:pic="http://schemas.openxmlformats.org/'
            'drawingml/2006/picture"><pic:blipFill>'
            f'<a:blip xmlns:r="http://schemas.openxmlformats.org/office'
            f'Document/2006/relationships" r:embed="{rid}"/>'
            '</pic:blipFill></pic:pic></a:graphicData></a:graphic>'
            '</wp:inline></w:drawing></w:r>')

    def para_runs(cp0: int, cp1: int) -> str:
        """Character runs for [cp0, cp1): field handling (keep the
        cached result between the separator 0x14 and end 0x15), inline
        pictures (0x01 + sprmCPicLocation), special chars dropped."""
        parts = []
        in_field_code = 0
        cp = cp0
        while cp < cp1:
            props = doc.char_props(cp)
            b = doc.run_end_at(cp)
            run_end = min(b, cp1) if b is not None else cp1
            chunk = doc.text_range(cp, run_end)
            buf = []
            for ch in chunk:
                if ch == "\x13":
                    in_field_code += 1
                elif ch == "\x14":
                    if in_field_code:
                        in_field_code -= 1
                elif ch == "\x15":
                    pass
                elif in_field_code:
                    pass
                elif ch == "\x01" and props.get("special"):
                    if "pic_off" in props:
                        if buf:
                            parts.append(run_xml("".join(buf), props))
                            buf = []
                        parts.append(drawing_xml(props["pic_off"]))
                elif ch in ("\x03", "\x04", "\x05", "\x08"):
                    pass  # shape anchors / annotation marks
                elif ch == "\x0b":
                    buf.append("\n")
                elif ch >= " " or ch == "\t":
                    buf.append(ch)
            if buf:
                parts.append(run_xml("".join(buf), props))
            cp = run_end
        return "".join(parts)

    def render_range(cp_lo: int, cp_hi: int) -> list[str]:
        """Paragraph stream of one subdocument range -> block XML."""
        out: list[str] = []
        table_rows: list[list[str]] = []
        row_cells: list[str] = []
        cell_paras: list[str] = []

        def flush_table():
            if not table_rows:
                return
            rows_xml = []
            for cells in table_rows:
                tcs = "".join(
                    f"<w:tc><w:tcPr/>{c or '<w:p/>'}</w:tc>"
                    for c in cells)
                rows_xml.append(f"<w:tr>{tcs}</w:tr>")
            n_cols = max(len(cells) for cells in table_rows)
            grid = ("<w:tblGrid>" + "<w:gridCol/>" * n_cols
                    + "</w:tblGrid>")
            out.append("<w:tbl><w:tblPr/>" + grid
                       + "".join(rows_xml) + "</w:tbl>")
            table_rows.clear()

        for (cp0, cp1, istd, grp) in doc.paragraphs:
            if cp0 < cp_lo or cp0 >= cp_hi:
                continue
            in_table = row_end = False
            ilfo = ilvl = None
            for sprm, opd in _iter_sprms(grp):
                if sprm == SPRM_PFINTABLE and opd and opd[0]:
                    in_table = True
                elif sprm == SPRM_PFTTP and opd and opd[0]:
                    row_end = True
                elif sprm == SPRM_PILFO and len(opd) >= 2:
                    ilfo = struct.unpack_from("<H", opd)[0]
                elif sprm == SPRM_PILVL and opd:
                    ilvl = opd[0]
            if row_end:
                table_rows.append(row_cells[:])
                row_cells.clear()
                continue
            sid, is_heading_n = style_for(istd)
            ppr = [f'<w:pStyle w:val="{sid}"/>']
            if is_heading_n:
                # LibreOffice chapter numbering: invisible numId on
                # every Heading N paragraph
                lvl = _heading_level(doc.style_names.get(istd, "")) or 1
                numbering_used[CHAPTER_NUM] = "none"
                ppr.append(f'<w:numPr><w:ilvl w:val="{lvl - 1}"/>'
                           f'<w:numId w:val="{CHAPTER_NUM}"/></w:numPr>')
            elif ilfo:
                fmt = doc.lfo_fmt.get(ilfo, "decimal")
                numbering_used[ilfo] = fmt
                ppr.append(f'<w:numPr><w:ilvl w:val="{ilvl or 0}"/>'
                           f'<w:numId w:val="{ilfo}"/></w:numPr>')
            runs = para_runs(cp0, cp1 - 1)  # drop the paragraph mark
            pxml = f"<w:p><w:pPr>{''.join(ppr)}</w:pPr>{runs}</w:p>"
            if in_table:
                txt = doc.text_range(cp0, cp1)
                if txt.endswith("\x07"):
                    # one paragraph per cell here: close the cell
                    cruns = runs
                    if not cruns:
                        # empty cell whose CELL MARK carries direct
                        # formatting: LibreOffice exports an empty
                        # styled run, which the docx backend turns
                        # into a rich cell group with empty text
                        mark = doc.char_props(cp1 - 1)
                        if mark.get("bold") or mark.get("italic"):
                            cruns = run_xml("", mark)
                    cell_paras.append(
                        f"<w:p><w:pPr>{''.join(ppr)}</w:pPr>"
                        f"{cruns}</w:p>")
                    row_cells.append("".join(cell_paras))
                    cell_paras.clear()
                else:
                    cell_paras.append(pxml)
                continue
            flush_table()
            out.append(pxml)
        flush_table()
        return out

    body = render_range(0, doc.ccp_text)

    # headers/footers: PlcfHdd maps the hdd subdocument to stories; the
    # first 6 are footnote/endnote separators, then per section
    # {hdrEven, hdrOdd, ftrEven, ftrOdd, hdrFirst, ftrFirst}
    footer_xml = None
    fc_hdd, lcb_hdd = doc._pair(11)
    if lcb_hdd >= 8:
        n_cps = lcb_hdd // 4
        hdd_cps = struct.unpack_from(f"<{n_cps}I", doc.tbl, fc_hdd)
        hdd_base = doc.ccp_text  # + ccpFtn (0 for the common case)
        if n_cps >= 11:
            a, b = hdd_cps[9], hdd_cps[10]  # ftrOdd story of section 0
            if b > a:
                # the story's final paragraph mark is its guard
                # terminator, not content (ww8 import semantics)
                blocks = render_range(hdd_base + a, hdd_base + b - 1)
                if blocks:
                    footer_xml = (
                        '<?xml version="1.0" encoding="UTF-8" '
                        'standalone="yes"?>'
                        f'<w:ftr xmlns:w="{W}">' + "".join(blocks)
                        + "</w:ftr>")

    # styles.xml with the LibreOffice hierarchy: Heading <- Title <-
    # Subtitle; Heading N based on Heading
    styles_used.setdefault("Normal", "Normal")
    styles = ['<w:style w:type="paragraph" w:default="1" '
              'w:styleId="Normal"><w:name w:val="Normal"/></w:style>',
              '<w:style w:type="paragraph" w:styleId="Heading">'
              '<w:name w:val="Heading"/>'
              '<w:basedOn w:val="Normal"/></w:style>']
    for sid, name in sorted(styles_used.items()):
        if sid in ("Normal", "Heading"):
            continue
        if sid == "Title":
            based = '<w:basedOn w:val="Heading"/>'
        elif sid == "Subtitle":
            based = '<w:basedOn w:val="Title"/>'
        elif _heading_level(name) is not None:
            based = '<w:basedOn w:val="Heading"/>'
        else:
            based = '<w:basedOn w:val="Normal"/>'
        styles.append(_STYLE_XML.format(
            sid=sid, name=escape(name, {'"': "&quot;"}), based=based))

    nums = []
    for num_id, fmt in sorted(numbering_used.items()):
        lvls = []
        for lv in range(9):
            if fmt == "none":
                lvls.append(f'<w:lvl w:ilvl="{lv}">'
                            '<w:numFmt w:val="none"/>'
                            '<w:lvlText w:val=""/></w:lvl>')
            elif fmt == "bullet":
                lvls.append(f'<w:lvl w:ilvl="{lv}">'
                            '<w:numFmt w:val="bullet"/>'
                            '<w:lvlText w:val="•"/></w:lvl>')
            else:
                lvls.append(
                    f'<w:lvl w:ilvl="{lv}"><w:start w:val="1"/>'
                    '<w:numFmt w:val="decimal"/>'
                    f'<w:lvlText w:val="%{lv + 1}."/></w:lvl>')
        nums.append(f'<w:abstractNum w:abstractNumId="{num_id}">'
                    + "".join(lvls) + "</w:abstractNum>")
    num_map = "".join(
        f'<w:num w:numId="{nid}"><w:abstractNumId w:val="{nid}"/></w:num>'
        for nid in sorted(numbering_used))

    sectpr = ""
    if footer_xml is not None:
        rels.append(
            '<Relationship Id="rIdFtr1" Type="http://schemas.openxml'
            'formats.org/officeDocument/2006/relationships/footer" '
            'Target="footer1.xml"/>')
        sectpr = ('<w:sectPr><w:footerReference xmlns:r="http://schemas.'
                  'openxmlformats.org/officeDocument/2006/relationships" '
                  'w:type="default" r:id="rIdFtr1"/></w:sectPr>')
    document = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:document xmlns:w="{W}"><w:body>'
                + "".join(body) + sectpr + "</w:body></w:document>")
    styles_xml = (f'<?xml version="1.0" encoding="UTF-8" standalone='
                  f'"yes"?><w:styles xmlns:w="{W}">'
                  + "".join(styles) + "</w:styles>")
    numbering_xml = (f'<?xml version="1.0" encoding="UTF-8" standalone='
                     f'"yes"?><w:numbering xmlns:w="{W}">'
                     + "".join(nums) + num_map + "</w:numbering>")
    rels_xml = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">' + "".join(rels)
                + '</Relationships>')
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Default Extension="png" ContentType="image/png"/>'
          '<Default Extension="jpeg" ContentType="image/jpeg"/>'
          '<Default Extension="gif" ContentType="image/gif"/>'
          '<Override PartName="/word/document.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.'
          'wordprocessingml.document.main+xml"/></Types>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("word/document.xml", document)
        z.writestr("word/styles.xml", styles_xml)
        z.writestr("word/numbering.xml", numbering_xml)
        z.writestr("word/_rels/document.xml.rels", rels_xml)
        if footer_xml is not None:
            z.writestr("word/footer1.xml", footer_xml)
        for fn, img in media:
            z.writestr(f"word/media/{fn}", img)
    return buf.getvalue()


def convert_doc(raw: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0):
    """Binary .doc -> Doc via the shared docx backend (the reference's
    origin keeps the LEGACY mimetype and the original bytes' hash)."""
    from .msword import convert_docx
    docx = doc_to_docx(raw)
    doc = convert_docx(docx, name=name,
                       filename=filename or f"{name}.doc",
                       binary_hash=binary_hash)
    doc.mimetype = "application/msword"
    return doc
