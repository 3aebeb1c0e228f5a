"""TrueType glyph ink extents (glyf bounding boxes) for text-cell
geometry.

The reference's PDF cell bboxes come from per-glyph outline boxes
(docling-parse renders via FreeType and unions glyph control boxes;
see its ``page_cell`` construction), so byte-identical exports need the
real ink extents, not ascent/descent approximations. This module parses
just enough of an embedded TrueType font program (head / loca / glyf /
cmap, incl. composite glyphs) to answer "what is the outline bbox of
char code C" in em units.

Pure stdlib ``struct`` over bytes - safe inside Spark workers, no native
libs (north rule: pure per-partition map).
"""

from __future__ import annotations

import struct

__all__ = ["TrueTypeInk"]


class TrueTypeInk:
    """Ink-extent oracle for one embedded TrueType font program.

    ``ink(code)`` -> (xmin, ymin, xmax, ymax) in em units, or None when
    the code has no outline (space, .notdef, unmapped).
    ``by_gid`` mode (CID fonts with Identity CIDToGIDMap) skips the
    cmap and treats the code as a glyph id directly.
    """

    def __init__(self, data: bytes, by_gid: bool = False):
        self.ok = False
        self.by_gid = by_gid
        self.gid_map: bytes | None = None  # CIDToGIDMap stream payload
        self._cache: dict[int, tuple | None] = {}
        try:
            self._parse(data)
            self.ok = True
        except (struct.error, IndexError, ValueError, KeyError):
            pass

    def _parse(self, data: bytes) -> None:
        if data[:4] == b"ttcf":  # font collection: first face
            off = struct.unpack(">I", data[12:16])[0]
        else:
            off = 0
        num_tables = struct.unpack(">H", data[off + 4:off + 6])[0]
        tabs: dict[str, tuple[int, int]] = {}
        for i in range(num_tables):
            o = off + 12 + 16 * i
            tag = data[o:o + 4].decode("latin1")
            toff, tlen = struct.unpack(">II", data[o + 8:o + 16])
            tabs[tag] = (toff, tlen)
        ho = tabs["head"][0]
        self.upem = struct.unpack(">H", data[ho + 18:ho + 20])[0] or 1000
        self.loc_long = struct.unpack(">h", data[ho + 50:ho + 52])[0]
        self.loca_off = tabs["loca"][0]
        self.glyf_off = tabs["glyf"][0]
        self.data = data
        self.cmap = None
        if not self.by_gid and "cmap" in tabs:
            self._parse_cmap(tabs["cmap"][0])
        # hmtx advances (font-program metrics; docling-parse derives its
        # cell rects from these, which can differ from the PDF /Widths
        # ints by sub-0.001em rounding that accumulates across a line)
        self.hmtx_off = self.n_hmetrics = 0
        if "hhea" in tabs and "hmtx" in tabs:
            hh = tabs["hhea"][0]
            self.n_hmetrics = struct.unpack(">H", data[hh + 34:hh + 36])[0]
            self.hmtx_off = tabs["hmtx"][0]

    def advance_gid(self, gid: int):
        """hmtx advance for a glyph id, in em units (None if absent)."""
        if not self.n_hmetrics:
            return None
        i = min(gid, self.n_hmetrics - 1)
        try:
            (aw,) = struct.unpack(
                ">H", self.data[self.hmtx_off + 4 * i:
                                self.hmtx_off + 4 * i + 2])
        except struct.error:
            return None
        return aw / self.upem

    def advance(self, code: int):
        """hmtx advance for a character code via the cmap, em units."""
        if self.by_gid:
            gid = code
            if self.gid_map is not None:
                i = 2 * code
                gid = (self.gid_map[i] << 8 | self.gid_map[i + 1]) \
                    if i + 1 < len(self.gid_map) else 0
            return self.advance_gid(gid)
        if self.cmap is None:
            return None
        gid = self.cmap(code)
        return self.advance_gid(gid) if gid else None

    def _parse_cmap(self, co: int) -> None:
        data = self.data
        n = struct.unpack(">H", data[co + 2:co + 4])[0]
        best = None
        # preference: (3,1) windows unicode, (3,0) windows symbol,
        # (1,0) mac roman, then anything
        prefs = {(3, 1): 0, (3, 0): 1, (1, 0): 2}
        best_rank = 99
        for i in range(n):
            pid, eid, off = struct.unpack(
                ">HHI", data[co + 4 + 8 * i:co + 12 + 8 * i])
            rank = prefs.get((pid, eid), 50)
            if rank < best_rank:
                best_rank, best = rank, (pid, eid, co + off)
        if best is None:
            return
        pid, eid, sub = best
        fmt = struct.unpack(">H", data[sub:sub + 2])[0]
        if fmt == 4:
            seg_x2 = struct.unpack(">H", data[sub + 6:sub + 8])[0]
            seg = seg_x2 // 2
            p = sub + 14
            ends = struct.unpack(f">{seg}H", data[p:p + seg_x2])
            p += seg_x2 + 2
            starts = struct.unpack(f">{seg}H", data[p:p + seg_x2])
            p += seg_x2
            deltas = struct.unpack(f">{seg}h", data[p:p + seg_x2])
            p += seg_x2
            rng_pos = p
            rngs = struct.unpack(f">{seg}H", data[p:p + seg_x2])

            def gid4(c: int) -> int:
                # symbol cmaps map 0x20..0xFF at 0xF000..0xF0FF
                if pid == 3 and eid == 0 and c < 0x100:
                    c = 0xF000 | c
                for i in range(seg):
                    if starts[i] <= c <= ends[i]:
                        if rngs[i] == 0:
                            return (c + deltas[i]) & 0xFFFF
                        addr = rng_pos + 2 * i + rngs[i] + 2 * (c - starts[i])
                        g = struct.unpack(">H",
                                          self.data[addr:addr + 2])[0]
                        return (g + deltas[i]) & 0xFFFF if g else 0
                return 0
            self.cmap = gid4
        elif fmt == 6:
            first, count = struct.unpack(">HH", data[sub + 6:sub + 10])
            gids = struct.unpack(f">{count}H",
                                 data[sub + 10:sub + 10 + 2 * count])
            self.cmap = (lambda c: gids[c - first]
                         if first <= c < first + count else 0)
        elif fmt == 0:
            gids0 = data[sub + 6:sub + 262]
            self.cmap = lambda c: gids0[c] if c < 256 else 0

    def _loca(self, gid: int) -> tuple[int, int]:
        if self.loc_long:
            a, b = struct.unpack(
                ">II", self.data[self.loca_off + 4 * gid:
                                 self.loca_off + 4 * gid + 8])
            return a, b
        a, b = struct.unpack(
            ">HH", self.data[self.loca_off + 2 * gid:
                             self.loca_off + 2 * gid + 4])
        return a * 2, b * 2

    def _gid_box(self, gid: int, depth: int = 0) -> tuple | None:
        """EXACT outline bbox (curve extrema, like FreeType's
        FT_Outline_Get_BBox which docling-parse renders through), not
        the glyf-header control box: quadratic off-curve points can
        overshoot the ink, and the groundtruth loc grid is fine enough
        to see the difference. Falls back to the header box when the
        point data doesn't parse."""
        if depth > 4:
            return None
        try:
            a, b = self._loca(gid)
        except struct.error:
            return None
        if a >= b:
            return None  # empty outline (space)
        g = self.glyf_off + a
        n_contours, xmin, ymin, xmax, ymax = struct.unpack(
            ">hhhhh", self.data[g:g + 10])
        if xmin == ymin == xmax == ymax == 0 and n_contours < 0:
            return None
        header_box = (xmin, ymin, xmax, ymax)
        try:
            if n_contours >= 0:
                exact = self._simple_exact_box(g, n_contours)
            else:
                exact = self._composite_box(g, depth)
            return exact if exact is not None else header_box
        except (struct.error, IndexError, ValueError):
            return header_box

    def _simple_exact_box(self, g: int, n_contours: int) -> tuple | None:
        data = self.data
        p = g + 10
        end_pts = struct.unpack(f">{n_contours}H",
                                data[p:p + 2 * n_contours])
        p += 2 * n_contours
        n_pts = (end_pts[-1] + 1) if end_pts else 0
        if n_pts == 0:
            return None
        ins_len = struct.unpack(">H", data[p:p + 2])[0]
        p += 2 + ins_len
        flags = []
        while len(flags) < n_pts:
            fl = data[p]; p += 1
            flags.append(fl)
            if fl & 8:  # repeat
                rep = data[p]; p += 1
                flags.extend([fl] * rep)
        flags = flags[:n_pts]
        xs = []
        v = 0
        for fl in flags:
            if fl & 2:
                d = data[p]; p += 1
                v += d if fl & 16 else -d
            elif not fl & 16:
                v += struct.unpack(">h", data[p:p + 2])[0]; p += 2
            xs.append(v)
        ys = []
        v = 0
        for fl in flags:
            if fl & 4:
                d = data[p]; p += 1
                v += d if fl & 32 else -d
            elif not fl & 32:
                v += struct.unpack(">h", data[p:p + 2])[0]; p += 2
            ys.append(v)
        lo_x = lo_y = 1e9
        hi_x = hi_y = -1e9
        start = 0
        for ce in end_pts:
            n = ce - start + 1
            if n <= 0:
                start = ce + 1
                continue
            pts = [(xs[start + i], ys[start + i], bool(flags[start + i] & 1))
                   for i in range(n)]
            # rotate so the contour starts on-curve (insert implied
            # midpoint when it is entirely off-curve)
            if not pts[0][2]:
                if pts[-1][2]:
                    pts = pts[-1:] + pts[:-1]
                else:
                    mx = (pts[0][0] + pts[-1][0]) / 2.0
                    my = (pts[0][1] + pts[-1][1]) / 2.0
                    pts = [(mx, my, True)] + pts
            cx, cy = pts[0][0], pts[0][1]
            if cx < lo_x: lo_x = cx
            if cx > hi_x: hi_x = cx
            if cy < lo_y: lo_y = cy
            if cy > hi_y: hi_y = cy
            seq = pts[1:] + [pts[0]]
            i = 0
            while i < len(seq):
                x1, y1, on1 = seq[i]
                if on1:
                    cx, cy = x1, y1
                    i += 1
                else:
                    # quadratic: find the on-curve end (explicit or
                    # implied midpoint)
                    if i + 1 < len(seq):
                        x2, y2, on2 = seq[i + 1]
                        if not on2:
                            x2, y2 = (x1 + x2) / 2.0, (y1 + y2) / 2.0
                            i += 1
                        else:
                            i += 2
                    else:
                        x2, y2 = pts[0][0], pts[0][1]
                        i += 1
                    for p0, p1, p2, is_x in ((cx, x1, x2, True),
                                             (cy, y1, y2, False)):
                        den = p0 - 2.0 * p1 + p2
                        if den:
                            t = (p0 - p1) / den
                            if 0.0 < t < 1.0:
                                v = ((1 - t) * (1 - t) * p0
                                     + 2 * (1 - t) * t * p1 + t * t * p2)
                                if is_x:
                                    if v < lo_x: lo_x = v
                                    if v > hi_x: hi_x = v
                                else:
                                    if v < lo_y: lo_y = v
                                    if v > hi_y: hi_y = v
                    cx, cy = x2, y2
                if cx < lo_x: lo_x = cx
                if cx > hi_x: hi_x = cx
                if cy < lo_y: lo_y = cy
                if cy > hi_y: hi_y = cy
            start = ce + 1
        if lo_x > hi_x:
            return None
        return (lo_x, lo_y, hi_x, hi_y)

    def _composite_box(self, g: int, depth: int) -> tuple | None:
        data = self.data
        p = g + 10
        lo_x = lo_y = 1e9
        hi_x = hi_y = -1e9
        while True:
            flags, gi = struct.unpack(">HH", data[p:p + 4])
            p += 4
            if flags & 1:  # ARG_1_AND_2_ARE_WORDS
                a1, a2 = struct.unpack(">hh", data[p:p + 4]); p += 4
            else:
                a1, a2 = struct.unpack(">bb", data[p:p + 2]); p += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 8:       # WE_HAVE_A_SCALE
                sx = sy = struct.unpack(">h", data[p:p + 2])[0] / 16384.0
                p += 2
            elif flags & 0x40:  # X_AND_Y_SCALE
                sx, sy = (v / 16384.0 for v in
                          struct.unpack(">hh", data[p:p + 4]))
                p += 4
            elif flags & 0x80:  # 2x2
                sx, s01, s10, sy = (v / 16384.0 for v in
                                    struct.unpack(">hhhh", data[p:p + 8]))
                p += 8
            dx, dy = (a1, a2) if flags & 2 else (0, 0)  # ARGS_ARE_XY
            sub = self._gid_box(gi, depth + 1)
            if sub is not None:
                x0, y0, x1, y1 = sub
                for px, py in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
                    tx = sx * px + s10 * py + dx
                    ty = s01 * px + sy * py + dy
                    if tx < lo_x: lo_x = tx
                    if tx > hi_x: hi_x = tx
                    if ty < lo_y: lo_y = ty
                    if ty > hi_y: hi_y = ty
            if not flags & 0x20:  # MORE_COMPONENTS
                break
        if lo_x > hi_x:
            return None
        return (lo_x, lo_y, hi_x, hi_y)

    def ink_gid(self, gid: int):
        """Ink box by raw glyph id (subset fonts whose /Differences names
        are gNN carry the gid in the name)."""
        key = ("g", gid)
        got = self._cache.get(key, False)
        if got is not False:
            return got
        box = None
        if self.ok and gid:
            raw = self._gid_box(gid)
            if raw is not None:
                u = float(self.upem)
                box = (raw[0] / u, raw[1] / u, raw[2] / u, raw[3] / u)
        self._cache[key] = box
        return box

    def ink(self, code: int):
        """(xmin, ymin, xmax, ymax) in em units, or None."""
        got = self._cache.get(code, False)
        if got is not False:
            return got
        box = None
        if self.ok:
            if self.by_gid:
                gid = code
                if self.gid_map is not None:
                    o = 2 * code
                    gid = (int.from_bytes(self.gid_map[o:o + 2], "big")
                           if o + 2 <= len(self.gid_map) else 0)
            else:
                gid = self.cmap(code) if self.cmap else 0
            if gid:
                raw = self._gid_box(gid)
                if raw is not None:
                    u = float(self.upem)
                    box = (raw[0] / u, raw[1] / u, raw[2] / u, raw[3] / u)
            elif gid == 0 and self.by_gid and code == 0:
                pass
        self._cache[code] = box
        return box


class CffInk:
    """Minimal CFF (FontFile3) probe: per-gid charstring LENGTH, enough
    to tell empty glyphs (space: just a width + endchar, <= 8 bytes)
    from real outlines. Full charstring interpretation is out of scope;
    callers get has_outline(gid) only."""

    def __init__(self, data: bytes):
        self.ok = False
        self._lens: list[int] | None = None
        try:
            self._parse(data)
            self.ok = True
        except (struct.error, IndexError, ValueError):
            pass

    @staticmethod
    def _read_index(data: bytes, pos: int):
        """-> (list of (start, end) item spans, next_pos)."""
        count = struct.unpack(">H", data[pos:pos + 2])[0]
        if count == 0:
            return [], pos + 2
        off_size = data[pos + 2]
        opos = pos + 3
        offs = []
        for i in range(count + 1):
            v = 0
            for b in data[opos + i * off_size:opos + (i + 1) * off_size]:
                v = (v << 8) | b
            offs.append(v)
        base = opos + (count + 1) * off_size - 1
        spans = [(base + offs[i], base + offs[i + 1]) for i in range(count)]
        return spans, base + offs[-1]

    def _parse(self, data: bytes) -> None:
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = self._read_index(data, pos)        # Name INDEX
        tops, pos = self._read_index(data, pos)          # Top DICT INDEX
        if not tops:
            raise ValueError("no top dict")
        strings, pos = self._read_index(data, pos)       # String INDEX
        a, b = tops[0]
        cs_off = charset_off = None
        operands: list[int] = []
        i = a
        while i < b:
            b0 = data[i]
            if 32 <= b0 <= 246:
                operands.append(b0 - 139); i += 1
            elif 247 <= b0 <= 250:
                operands.append((b0 - 247) * 256 + data[i + 1] + 108); i += 2
            elif 251 <= b0 <= 254:
                operands.append(-(b0 - 251) * 256 - data[i + 1] - 108); i += 2
            elif b0 == 28:
                operands.append(struct.unpack(">h", data[i + 1:i + 3])[0])
                i += 3
            elif b0 == 29:
                operands.append(struct.unpack(">i", data[i + 1:i + 5])[0])
                i += 5
            elif b0 == 30:  # real number: skip nibbles to 0xF terminator
                i += 1
                while i < b:
                    nib = data[i]; i += 1
                    if (nib & 0x0F) == 0x0F or (nib >> 4) == 0x0F:
                        break
                operands.append(0)
            elif b0 == 12:
                operands = []; i += 2
            else:
                if b0 == 17 and operands:    # CharStrings
                    cs_off = operands[-1]
                elif b0 == 15 and operands:  # charset
                    charset_off = operands[-1]
                operands = []; i += 1
        if cs_off is None:
            raise ValueError("no CharStrings op")
        spans, _ = self._read_index(data, cs_off)
        self._lens = [e - s for s, e in spans]
        # charset: gid -> SID; custom names (SID >= 391) live in the
        # String INDEX. Builds name -> gid for subset gNN lookups.
        self._name_gid: dict[str, int] = {}
        n_glyphs = len(self._lens)
        if charset_off not in (None, 0, 1, 2) and n_glyphs > 1:
            sids = [0]
            fmt = data[charset_off]
            p = charset_off + 1
            if fmt == 0:
                for _ in range(n_glyphs - 1):
                    sids.append(struct.unpack(">H", data[p:p + 2])[0])
                    p += 2
            elif fmt in (1, 2):
                while len(sids) < n_glyphs:
                    first = struct.unpack(">H", data[p:p + 2])[0]
                    if fmt == 1:
                        nleft = data[p + 2]; p += 3
                    else:
                        nleft = struct.unpack(">H", data[p + 3:p + 5])[0]
                        p += 4 + 1
                    for k in range(nleft + 1):
                        if len(sids) >= n_glyphs:
                            break
                        sids.append(first + k)
            for gid, sid in enumerate(sids):
                if sid >= 391 and sid - 391 < len(strings):
                    s0, s1 = strings[sid - 391]
                    self._name_gid[
                        data[s0:s1].decode("latin1")] = gid

    def has_outline(self, gid: int) -> bool:
        if not self.ok or self._lens is None or gid >= len(self._lens):
            return True  # unknown: assume real glyph
        # a true space charstring is width + endchar (<= 4 bytes); even
        # an 'l' outline needs a moveto + line ops
        return self._lens[gid] > 4

    def has_outline_name(self, name: str) -> bool:
        gid = getattr(self, "_name_gid", {}).get(name)
        if gid is None:
            return True
        return self.has_outline(gid)
