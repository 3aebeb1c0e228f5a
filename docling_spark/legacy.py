"""Legacy binary Office: OLE2 compound files + BIFF8 Excel (.xls).

The reference converts legacy formats by shelling out to LibreOffice and
re-parsing the modern output (``document_converter.py`` legacy routing);
this module reads the BIFF8 workbook directly with stdlib struct/codecs
and feeds the SAME sheet model the xlsx path uses
(``msexcel.find_data_tables`` flood fill, section-label split, page
sizing), so ``legacy_sample.xls`` reproduces the shipped groundtruth
without a LibreOffice dependency. .doc/.ppt remain out of scope (full
Word piece-table / PowerPoint Escher models).
"""

from __future__ import annotations

import struct
from typing import Optional

from .model import Doc

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE


class OleFile:
    """Minimal OLE2/CFB reader: directory walk + stream extraction."""

    def __init__(self, data: bytes):
        if data[:8] != OLE_MAGIC:
            raise ValueError("not an OLE2 compound file")
        self.data = data
        (self.sector_shift, self.mini_shift) = struct.unpack(
            "<HH", data[30:34])
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        (num_fat, dir_first, _x, self.mini_cutoff, minifat_first,
         num_minifat, difat_first, num_difat) = struct.unpack(
            "<IIIIIIII", data[44:76])
        # FAT sector list: 109 entries in the header DIFAT + chained DIFAT
        fat_sectors = [s for s in struct.unpack("<109I", data[76:512])
                       if s not in (FREESECT, ENDOFCHAIN)]
        ds = difat_first
        for _ in range(num_difat):
            if ds in (FREESECT, ENDOFCHAIN):
                break
            raw = self._sector(ds)
            entries = struct.unpack(f"<{self.ssz // 4}I", raw)
            fat_sectors.extend(
                s for s in entries[:-1] if s not in (FREESECT, ENDOFCHAIN))
            ds = entries[-1]
        fat = []
        for s in fat_sectors:
            fat.extend(struct.unpack(f"<{self.ssz // 4}I", self._sector(s)))
        self.fat = fat
        self.dir_stream = self._read_chain(dir_first)
        minifat = []
        ms = minifat_first
        while ms not in (FREESECT, ENDOFCHAIN) and len(minifat) < 1 << 20:
            minifat.extend(
                struct.unpack(f"<{self.ssz // 4}I", self._sector(ms)))
            ms = self.fat[ms] if ms < len(self.fat) else ENDOFCHAIN
        self.minifat = minifat
        self.entries = self._parse_dir()
        root = self.entries[0]
        self.mini_container = self._read_chain(root["start"])[:root["size"]]

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        return self.data[off:off + self.ssz]

    def _read_chain(self, start: int, limit: int = 1 << 24) -> bytes:
        out = []
        s = start
        seen = 0
        while s not in (FREESECT, ENDOFCHAIN) and seen * self.ssz < limit:
            out.append(self._sector(s))
            s = self.fat[s] if s < len(self.fat) else ENDOFCHAIN
            seen += 1
        return b"".join(out)

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = []
        s = start
        while s not in (FREESECT, ENDOFCHAIN) and len(out) * self.mssz < size + self.mssz:
            off = s * self.mssz
            out.append(self.mini_container[off:off + self.mssz])
            s = self.minifat[s] if s < len(self.minifat) else ENDOFCHAIN
        return b"".join(out)[:size]

    def _parse_dir(self) -> list[dict]:
        entries = []
        d = self.dir_stream
        for off in range(0, len(d) - 127, 128):
            e = d[off:off + 128]
            (name_len,) = struct.unpack("<H", e[64:66])
            if name_len < 2:
                continue
            name = e[:max(0, name_len - 2)].decode("utf-16-le",
                                                   errors="replace")
            etype = e[66]
            start, size = struct.unpack("<II", e[116:124])
            entries.append({"name": name, "type": etype,
                            "start": start, "size": size})
        return entries

    def stream(self, name: str) -> Optional[bytes]:
        for e in self.entries:
            if e["name"] == name and e["type"] == 2:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"])[:e["size"]]
        return None


# ------------------------------------------------------------------ BIFF8

def _rk_value(rk: int):
    cent = rk & 1
    if rk & 2:  # signed 30-bit int
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        val = float(v)
    else:       # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~3) << 32))[0]
    if cent:
        val /= 100.0
    return val


def _biff_records(stream: bytes):
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        code, length = struct.unpack("<HH", stream[pos:pos + 4])
        yield code, pos, stream[pos + 4:pos + 4 + length]
        pos += 4 + length


def _parse_sst(payload_parts: list[bytes]) -> list[str]:
    """Shared-string table incl. CONTINUE-record string splits (the
    continuation restates the grbit flag byte mid-string)."""
    strings: list[str] = []
    part_idx = 0
    data = payload_parts[0]
    pos = 8  # total/unique counts
    (_total, unique) = struct.unpack("<II", data[:8])

    def need(k: int):
        nonlocal data, pos, part_idx
        while pos + k > len(data):
            part_idx += 1
            data = data[pos:] + payload_parts[part_idx]
            pos = 0
        return True

    for _ in range(unique):
        need(3)
        (cch,) = struct.unpack("<H", data[pos:pos + 2])
        grbit = data[pos + 2]
        pos += 3
        ext = 0
        if grbit & 0x08:  # rich runs
            need(2)
            (runs,) = struct.unpack("<H", data[pos:pos + 2])
            pos += 2
            ext += 4 * runs
        if grbit & 0x04:  # far-east
            need(4)
            (sz,) = struct.unpack("<I", data[pos:pos + 4])
            pos += 4
            ext += sz
        chars = []
        remaining = cch
        wide = grbit & 0x01
        while remaining:
            avail = len(data) - pos
            if avail == 0:
                part_idx += 1
                data = payload_parts[part_idx]
                pos = 0
                wide = data[0] & 0x01
                pos = 1
                avail = len(data) - pos
            take = min(remaining, avail // 2 if wide else avail)
            if take == 0:
                break
            if wide:
                chars.append(data[pos:pos + take * 2]
                             .decode("utf-16-le", errors="replace"))
                pos += take * 2
            else:
                chars.append(data[pos:pos + take].decode("latin-1"))
                pos += take
            remaining -= take
        strings.append("".join(chars))
        while ext:
            avail = len(data) - pos
            if avail == 0:
                part_idx += 1
                data = payload_parts[part_idx]
                pos = 0
                avail = len(data)
            take = min(ext, avail)
            pos += take
            ext -= take
    return strings


def _cast(value: float):
    if value == int(value):
        return int(value)
    return value


def read_xls_sheets(data: bytes):
    """xls bytes -> list of msexcel._Sheet-compatible sheet objects."""
    from .msexcel import _Sheet

    ole = OleFile(data)
    wb = ole.stream("Workbook") or ole.stream("Book")
    if wb is None:
        raise ValueError("no Workbook stream")
    # globals: SST + BOUNDSHEET offsets
    sst: list[str] = []
    bounds: list[tuple[int, str]] = []
    records = list(_biff_records(wb))
    for i, (code, off, payload) in enumerate(records):
        if code == 0x00FC:  # SST (+ CONTINUE 0x003C)
            parts = [payload]
            j = i + 1
            while j < len(records) and records[j][0] == 0x003C:
                parts.append(records[j][2])
                j += 1
            sst = _parse_sst(parts)
        elif code == 0x0085:  # BOUNDSHEET
            (stream_pos,) = struct.unpack("<I", payload[:4])
            name_len = payload[6]
            opts = payload[7]
            if opts & 0x01:
                name = payload[8:8 + name_len * 2].decode(
                    "utf-16-le", errors="replace")
            else:
                name = payload[8:8 + name_len].decode("latin-1")
            bounds.append((stream_pos, name))
    sheets = []
    for idx, (spos, name) in enumerate(bounds):
        sheet = _Sheet(name, "visible", False, "")
        sheet.index_in_worksheets = idx + 1
        for code, off, payload in _biff_records(wb[spos:]):
            if code == 0x000A and off > 0:  # EOF of this substream
                break
            if code == 0x00FD:  # LABELSST
                r, c, _xf, isst = struct.unpack("<HHHI", payload[:10])
                if isst < len(sst):
                    sheet.cells[(r, c)] = sst[isst]
            elif code == 0x0203:  # NUMBER
                r, c, _xf = struct.unpack("<HHH", payload[:6])
                (v,) = struct.unpack("<d", payload[6:14])
                sheet.cells[(r, c)] = _cast(v)
            elif code == 0x027E:  # RK
                r, c, _xf, rk = struct.unpack("<HHHI", payload[:10])
                sheet.cells[(r, c)] = _cast(_rk_value(rk))
            elif code == 0x00BD:  # MULRK
                r, c0 = struct.unpack("<HH", payload[:4])
                body = payload[4:-2]
                for k in range(len(body) // 6):
                    _xf, rk = struct.unpack(
                        "<HI", body[k * 6:k * 6 + 6])
                    sheet.cells[(r, c0 + k)] = _cast(_rk_value(rk))
            elif code == 0x0204:  # LABEL (inline, BIFF8)
                r, c, _xf, cch, grbit = struct.unpack(
                    "<HHHHB", payload[:9])
                raw = payload[9:]
                if grbit & 1:
                    sheet.cells[(r, c)] = raw[:cch * 2].decode(
                        "utf-16-le", errors="replace")
                else:
                    sheet.cells[(r, c)] = raw[:cch].decode("latin-1")
            elif code == 0x00E5:  # MERGEDCELLS
                (cnt,) = struct.unpack("<H", payload[:2])
                for k in range(cnt):
                    r0, r1, c0, c1 = struct.unpack(
                        "<HHHH", payload[2 + k * 8:10 + k * 8])
                    sheet.merged.append((r0, c0, r1, c1))
        sheets.append(sheet)
    return sheets


XLS_MIMETYPE = "application/vnd.ms-excel"


def convert_xls(data: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0) -> Doc:
    """Legacy .xls bytes -> Doc via the shared Excel table pipeline."""
    from .model import BODY
    from .msexcel import (_convert_tables, _page_size,
                          _sort_children_by_top)

    class _NoComments:
        threaded: dict = {}

    sheets = read_xls_sheets(data)
    doc = Doc(name, filename=filename or f"{name}.xls",
              binary_hash=binary_hash, mimetype=XLS_MIMETYPE)
    for page_no, sheet in enumerate(sheets, start=1):
        group = doc.add_group(label="sheet", name=sheet.name,
                              content_layer=BODY)
        _convert_tables(doc, _NoComments(), sheet, group, page_no,
                        BODY, 0)
        _sort_children_by_top(doc, group, page_no)
        doc.pages[page_no] = _page_size(doc, page_no)
    return doc
