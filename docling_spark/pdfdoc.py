"""PDF -> Doc assembly: deterministic layout heuristics over text cells.

The reference's PDF pipeline runs an ML layout model between parsing and
assembly (``docling/pipeline/standard_pdf_pipeline.py``); its deterministic
stages (cluster postprocess, reading order, sanitize) live in our
``layout.py``. This module supplies the deterministic *replacement* for the
ML step: font-size/position heuristics that fold line cells into paragraph
clusters and classify them (title / section_header / text / list_item /
page_header / page_footer / code), then reuses the shared sanitize +
reading-order machinery, so the whole PDF path is reproducible in a Spark
worker with no model weights.

Provenance mirrors docling-core: every item carries
``{page_no, bbox {l,t,r,b coord_origin=BOTTOMLEFT}, charspan}``.
"""

from __future__ import annotations

import re
from typing import Optional

from .layout import BBox, merge_split_text, sanitize_text
from .model import Doc, TextItem
from .pdftext import TextCell, extract_page_cells

__all__ = ["convert_pdf", "looks_like_pdf"]

_RTL_CHAR_RE = re.compile(r"[֐-ࣿיִ-﷿ﹰ-﻿]")
_LTR_CHAR_RE = re.compile(r"[A-Za-zÀ-ɏ]")


def _is_rtl(text: str) -> bool:
    r = len(_RTL_CHAR_RE.findall(text))
    return r > 0 and r > len(_LTR_CHAR_RE.findall(text))


_BULLET_RE = re.compile(r"^\s*(?:[•‣◦⁃∙·•‣▪–—*-]|"
                        r"\(?\d{1,3}[.)]|\(?[a-z][.)])\s+")
# symbol-font bullets (checkbox/wingding glyphs mapped to C1 controls or
# private-use chars): classify as list items but KEEP the glyph in the
# item text (the reference groundtruth retains it)
_GLYPH_BULLET_RE = re.compile(
    r"^(?:[\x7f-\x9f\ue000-\uf8ff]|(?:/g\d+){1,2})\s")
_NUMBERED_HEADING_RE = re.compile(r"^\s*\d+(?:\.\d+)*\.?\s+\S")
_MARKER_ONLY_RE = re.compile(
    r"^[•‣◦⁃∙·▪–—*\x7f-\x9f\ue000-\uf8ff-]$|^\(?\d{1,3}[.)]$"
    r"|^(?:/g\d+){1,2}$")
_CODE_HINT_RE = re.compile(
    r"(?:^\s{4,}|[{};]\s*$|^\s*(?:def|class|function|var|let|const|import|"
    r"return|if|for|while)\b)")


def looks_like_pdf(raw: bytes) -> bool:
    return raw[:5] == b"%PDF-" or b"%PDF-" in raw[:1024]


class _Block:
    __slots__ = ("cells", "label")

    def __init__(self, cell: TextCell):
        self.cells = [cell]
        self.label = "text"

    @property
    def font_size(self) -> float:
        return max(c.font_size for c in self.cells)

    @property
    def bold(self) -> bool:
        return all(c.bold for c in self.cells)

    @property
    def italic(self) -> bool:
        return all(getattr(c, "italic", False) for c in self.cells)

    def bbox(self) -> tuple[float, float, float, float]:
        return (min(c.l for c in self.cells), min(c.t for c in self.cells),
                max(c.r for c in self.cells), max(c.b for c in self.cells))

    def prov_bbox(self) -> tuple[float, float, float, float]:
        """Export bbox: CapHeight/scaled-Descent vertical extents and
        whitespace-trimmed horizontal extents (reference cell-rect
        parity); layout decisions use the nominal bbox() instead."""
        return (min(getattr(c, "ink_l", c.l) for c in self.cells),
                min(getattr(c, "ink_t", c.t) for c in self.cells),
                max(getattr(c, "ink_r", c.r) for c in self.cells),
                max(getattr(c, "ink_b", c.b) for c in self.cells))


def _body_font_size(cells: list[TextCell]) -> float:
    """Char-weighted median font size = the page's body size."""
    weighted: list[float] = []
    for c in cells:
        weighted.extend([c.font_size] * max(1, min(len(c.text), 200)))
    weighted.sort()
    return weighted[len(weighted) // 2] if weighted else 10.0


def _merge_into_blocks(cells: list[TextCell], body_size: float,
                       fig_regions: Optional[list] = None) -> list[_Block]:
    """Fold consecutive line cells into paragraph blocks.

    Join rule: next line starts within 1.9x line-height below the current
    block, with a compatible font size and horizontal overlap - the
    deterministic analog of layout-model text clusters.
    """
    blocks: list[_Block] = []
    for cell in cells:
        merged = False
        # a stranded lone punctuation mark (a "." left behind across a
        # column gutter) is its own block: the reference's layout model
        # emits it as an orphan cluster (amt_handbook groundtruth has a
        # standalone "." text item). A lone mark that CONTINUES the
        # previous cell's visual row (a style-split "Definition ." in
        # redp5110) is not stranded and merges normally.
        if len(cell.text.strip()) == 1 and cell.text.strip() in ".,;:!?":
            last = blocks[-1].cells[-1] if blocks else None
            same_row = (last is not None
                        and min(cell.b, last.b) - max(cell.t, last.t)
                        > 0.5 * min(cell.b - cell.t, last.b - last.t))
            if not same_row:
                blocks.append(_Block(cell))
                continue
        # a line opening with a list enumerator/bullet at (or left of) the
        # block's left edge starts a NEW block - otherwise consecutive
        # numbered items fold into one paragraph
        starts_item = bool(_BULLET_RE.match(cell.text)
                           or _GLYPH_BULLET_RE.match(cell.text)
                           or _MARKER_ONLY_RE.match(cell.text.strip()))
        if blocks and starts_item:
            last = blocks[-1].cells[-1]
            if cell.t > last.b - 2.0:  # a new line, not a row continuation
                blocks.append(_Block(cell))
                continue
        if blocks:
            blk = blocks[-1]
            last = blk.cells[-1]
            line_h = max(last.b - last.t, 1.0)
            v_gap = cell.t - last.b
            v_overlap = min(cell.b, last.b) - max(cell.t, last.t)
            same_size = abs(cell.font_size - last.font_size) <= max(
                0.15 * last.font_size, 0.6)
            # bullet glyphs render in a symbol font at a different size;
            # a marker-only block must still absorb its text (same row OR
            # the next line, when the bullet sits on its own line)
            marker_only_blk = bool(_MARKER_ONLY_RE.match("".join(
                    c.text for c in blk.cells).strip()))
            if marker_only_blk:
                same_size = True
            # same visual row, continuing rightward (sentence-gap splits);
            # never across a detected column boundary
            same_col = (getattr(cell, "col", None)
                        == getattr(last, "col", None))
            same_row = (same_col and v_overlap > 0.5 * line_h
                        and cell.l >= last.r - 2.0
                        and cell.l - last.r < 3.0 * max(cell.font_size,
                                                        last.font_size))
            h_overlap = (min(cell.r, max(c.r for c in blk.cells))
                         - max(cell.l, min(c.l for c in blk.cells)))
            near = (same_col
                    and -0.4 * line_h <= v_gap <= 0.9 * line_h)
            rtl_pair = _is_rtl(cell.text) and any(
                _is_rtl(c.text) for c in blk.cells)
            # RTL rows read right-to-left: a same-row continuation extends
            # LEFTWARD of the previous (logical) cell
            if (not same_row and rtl_pair and same_col
                    and v_overlap > 0.5 * line_h
                    and last.l >= cell.r - 2.0
                    and last.l - cell.r < 3.0 * max(cell.font_size,
                                                    last.font_size)):
                same_row = True
            # a paragraph interrupted by an absorbed figure region
            # continues below it (the reference's reading-order model
            # merges such flows): allow the jump when the vertical gap is
            # spanned by a figure region in the same column, the block
            # doesn't end a sentence, and the continuation starts
            # lowercase
            if (not near and not same_row and fig_regions and same_col
                    and v_gap > 0):
                blk_txt = blk.cells[-1].text.rstrip()
                cont = cell.text.lstrip()
                if (blk_txt and not blk_txt.endswith((".", "!", "?", ":"))
                        and cont[:1].islower()):
                    for (fl, ft, fr, fb) in fig_regions:
                        h_ov = (min(fr, max(cell.r, last.r))
                                - max(fl, min(cell.l, last.l)))
                        if (h_ov > 0 and last.b <= ft + 12
                                and cell.t >= fb - 12
                                and v_gap <= (fb - ft) + 3 * line_h):
                            near = True
                            break
            # tight-set RTL justified flows: the reference's layout model
            # clusters them across one paragraph-sized gap when the line
            # pitch is tight (<= 1.25 em); loose-set RTL text (pitch
            # ~1.7 em) keeps its paragraph breaks
            if (not near and rtl_pair and same_col
                    and 0 < v_gap <= 1.35 * line_h):
                tops = sorted({round(c.t, 1) for c in blk.cells})
                pitches = [y2 - y1 for y1, y2 in zip(tops, tops[1:])
                           if y2 - y1 > 2.0]
                if pitches:
                    pitch = sorted(pitches)[len(pitches) // 2]
                    if pitch <= 1.25 * cell.font_size:
                        near = True
            # a first-line indent starts a new paragraph (docling's layout
            # model separates indented paragraphs; the indent is the only
            # deterministic signal). List markers are excluded from the
            # block's left edge, and an indent beyond ~2.2em is layout
            # (code, centering), not a paragraph indent. Monospace blocks
            # never indent-split - code indentation is structure.
            text_lefts = [c.l for c in blk.cells
                          if not _MARKER_ONLY_RE.match(c.text.strip())]
            blk_left = min(text_lefts) if text_lefts else min(
                c.l for c in blk.cells)
            both_mono = cell.mono and last.mono
            em = cell.font_size
            # hanging-indent continuations of a list item are not
            # paragraph indents
            is_list_blk = bool(
                _BULLET_RE.match(blk.cells[0].text)
                or _GLYPH_BULLET_RE.match(blk.cells[0].text)
                or marker_only_blk)
            # RTL lines are ragged on the LEFT (line ends), so left-edge
            # indentation carries no paragraph signal there
            indented = (not same_row and not both_mono and not is_list_blk
                        and not rtl_pair
                        and 0.7 * em < cell.l - blk_left <= 2.2 * em)
            # outdent: the new line starts well LEFT of a single-line
            # block (centered/indented material - a formula, a caption);
            # multi-line blocks with an indented first line are ordinary
            # paragraphs and must keep flowing
            blk_single_line = all(
                abs(c.t - blk.cells[0].t) <= 2.0 for c in blk.cells)
            # threshold 3em: an indented paragraph FIRST line outdents by
            # ~1-1.5em to its own body and must keep flowing; centered
            # formulas/captions sit several em right of the column edge
            outdented = (not same_row and not both_mono and blk_single_line
                         and blk_left - cell.l > 3.0 * em)
            indented = indented or outdented
            # a bold/regular weight CHANGE between consecutive lines is a
            # block boundary (bold headings at body size; the layout
            # model separates them) - same-row continuations exempt
            same_weight = ((cell.bold == last.bold
                            and getattr(cell, "italic", False)
                            == getattr(last, "italic", False))
                           or both_mono)
            if same_size and not indented and (same_row or (
                    near and same_weight and (
                    h_overlap > -2.0 or abs(cell.l - last.l) < 2.0
                    or both_mono))):
                blk.cells.append(cell)
                merged = True
        if not merged:
            blocks.append(_Block(cell))
    return blocks


def _block_lines(blk: _Block) -> list[str]:
    """Cell texts as visual lines; adjacent same-row RTL cells (a word the
    band splitter cut at a diacritic boundary) fuse WITHOUT a space."""
    lines: list[str] = []
    prev = None
    for c in blk.cells:
        if prev is not None:
            same_line = (min(prev.b, c.b) - max(prev.t, c.t)
                         > 0.5 * min(prev.b - prev.t, c.b - c.t))
            if same_line and _is_rtl(c.text) and _is_rtl(prev.text):
                gap = prev.l - c.r  # RTL: this cell sits left of prev
                if -2.0 < gap < 0.2 * max(c.font_size, prev.font_size):
                    lines[-1] = lines[-1] + c.text
                    prev = c
                    continue
        lines.append(c.text)
        prev = c
    return lines


_MATH_RE = re.compile(r"^[\w\s()\[\]{}+\-*/=<>.,^_|≤≥≈≠±×÷∑∏∫√∞αβγδεθλμπσφω]+$")


def _classify(blocks: list[_Block], body_size: float, page_no: int,
              page_height: float, page_width: float,
              is_first_page: bool) -> None:
    for i, blk in enumerate(blocks):
        text = " ".join(c.text for c in blk.cells)
        size = blk.font_size
        l, t, r, b = blk.bbox()
        # visual lines, not cells - bold/style splits put several cells on
        # one baseline
        n_lines = 1 + sum(
            1 for j in range(1, len(blk.cells))
            if blk.cells[j].t - blk.cells[j - 1].t > 2.0)
        if t < 0.045 * page_height and len(text) < 120 and n_lines == 1:
            blk.label = "page_header"
            continue
        # running head: FIRST block on the page, single line in the top
        # margin strip, set smaller than the body text (arXiv/LNCS style)
        if (i == 0 and t < 0.15 * page_height and n_lines == 1
                and len(text) < 120 and size < 0.95 * body_size
                and not text.rstrip().endswith(".")):
            blk.label = "page_header"
            continue
        # bare page number in the top margin (arXiv running heads)
        if (t < 0.15 * page_height and n_lines == 1 and len(text) <= 4
                and text.strip().isdigit()):
            blk.label = "page_header"
            continue
        if b > 0.955 * page_height and len(text) < 120 and n_lines <= 2:
            blk.label = "page_footer"
            continue
        # bare page number in the bottom margin
        if (b > 0.8 * page_height and n_lines == 1 and len(text) <= 8
                and text.strip().isdigit()):
            blk.label = "page_footer"
            continue
        # display math: a centered standalone line with an equation shape
        center = (l + r) / 2.0
        if (n_lines == 1 and "=" in text and len(text) < 80
                and abs(center - page_width / 2.0) < 0.12 * page_width
                and l > 0.22 * page_width
                and _MATH_RE.match(text)
                and sum(ch.isalpha() for ch in text) <
                    max(4, len(text) // 3)):
            blk.label = "formula"
            continue
        # NOTE: no "title" label on the PDF path - the reference's layout
        # model emits section_header for top headings (every pdf
        # groundtruth md starts with "##"), so we match that.
        if (size > 1.08 * body_size and n_lines <= 2 and len(text) < 150
                and not text.rstrip().endswith((".", ",", ";", ":"))
                and not _GLYPH_BULLET_RE.match(text)):
            blk.label = "section_header"
            continue
        # italic-at-body-size headings (the layout model keys on any
        # style contrast; e.g. FAA handbook headings set in Times-Italic).
        # Caption-shaped lines stay text so the picture-caption pass can
        # claim them.
        if (blk.italic and size >= body_size - 0.1 and n_lines == 1
                and len(text) < 80 and len(text.split()) <= 10
                and text[:1].isupper()
                and not text.rstrip().endswith((".", ",", ";", ":"))
                and not _CAPTION_RE.match(text)
                and not _BULLET_RE.match(text)
                and not _GLYPH_BULLET_RE.match(text)):
            blk.label = "section_header"
            continue
        # bold-at-body-size headings (the layout model keys on weight)
        if (blk.bold and size >= body_size - 0.1 and n_lines <= 2
                and len(text) < 120 and len(text.split()) <= 14
                and not text.rstrip().endswith((".", ",", ";", ":"))
                and not _BULLET_RE.match(text)
                and not _GLYPH_BULLET_RE.match(text)):
            blk.label = "section_header"
            continue
        if (_NUMBERED_HEADING_RE.match(text) and n_lines == 1
                and size >= body_size and len(text) < 90
                and not text.rstrip().endswith(".")):
            # same-size numbered headings ("5.1 Hyper Parameter ...")
            words = text.split()
            if len(words) <= 10 and sum(
                    1 for w in words[1:] if w[:1].isupper()) >= max(
                        1, (len(words) - 1) // 2):
                blk.label = "section_header"
                continue
        if _BULLET_RE.match(text) and n_lines <= 6:
            blk.label = "list_item"
            continue
        if _GLYPH_BULLET_RE.match(text) and n_lines <= 6:
            blk.label = "glyph_list_item"
            continue
        # fill-in-blank lines ("_______ at the national level") are form
        # list items in the reference groundtruth
        if text.lstrip().startswith("___") and n_lines == 1:
            blk.label = "glyph_list_item"
            continue
        mono_cells = sum(1 for c in blk.cells if c.mono)
        if mono_cells * 2 > len(blk.cells):
            blk.label = "code"
            continue
        code_hits = sum(1 for c in blk.cells if _CODE_HINT_RE.search(c.text))
        if n_lines >= 2 and code_hits >= max(2, n_lines // 2):
            blk.label = "code"


_TABLE_CAP_RE = re.compile(r"^Table\s+\d+[.:]")
_CAPTION_RE = re.compile(r"^(?:Listing|Figure|Fig\.|Table|Algorithm)\s+\d+",
                         re.I)


def _merge_across_figures(blocks: list[_Block], fig_regions) -> list:
    """A text block interrupted by a figure region (and its caption)
    continues below it: splice the continuation into the upstream block
    when the upstream doesn't end a sentence and the continuation starts
    lowercase (the reference's reading-order merge step;
    ``readingorder_model.py:406-412``)."""
    if not fig_regions:
        return blocks
    out = list(blocks)
    i = 0
    while i < len(out):
        a = out[i]
        if a.label != "text":
            i += 1
            continue
        a_txt = a.cells[-1].text.rstrip()
        if not a_txt or a_txt.endswith((".", "!", "?", ":")):
            i += 1
            continue
        # look past caption-shaped blocks and page furniture for the
        # continuation (the figure pushed the text into the next column,
        # so geometry can't link them - the reference's merge step keys
        # on the TEXT: unfinished sentence + lowercase continuation)
        j = i + 1
        skipped = False
        while j < len(out):
            blk_j = out[j]
            if blk_j.label in ("page_header", "page_footer"):
                j += 1
                skipped = True
                continue
            if (blk_j.label == "text" and len(blk_j.cells) <= 2
                    and _CAPTION_RE.match(" ".join(
                        c.text for c in blk_j.cells))):
                j += 1
                skipped = True
                continue
            break
        if not skipped or j >= len(out):
            i += 1
            continue  # nothing skipped; cell-level rule handles direct gaps
        b = out[j]
        if b.label != "text":
            i += 1
            continue
        cont = b.cells[0].text.lstrip()
        if not cont[:1].islower():
            i += 1
            continue
        a.cells.extend(b.cells)
        del out[j]
        # stay on i: the merged block may continue further
    return out


def _captions_after_code(blocks: list[_Block]) -> list[_Block]:
    """A caption line directly above a code block attaches to it
    (docling CodeItem captions; md serializes code first, then the
    caption; doctags nests it)."""
    out = list(blocks)
    for i in range(len(out) - 1):
        if (out[i].label == "text" and out[i + 1].label == "code"
                and len(out[i].cells) == 1
                and _CAPTION_RE.match(out[i].cells[0].text)):
            out[i], out[i + 1] = out[i + 1], out[i]
            out[i + 1].label = "code_caption"
    return out


def _order_columns(cells, page_width):
    """Two-column reading order (reference: the reading-order model
    resolves columns; this is the deterministic version): when cells
    split cleanly left/right of the page midline, emit left column then
    right column within each vertical zone delimited by full-width
    (spanning) elements."""
    if len(cells) < 10:
        return cells
    # find the column gutter dynamically: the x in the middle half of the
    # page crossed by the fewest cells (two-column gutters are rarely at
    # the exact page midline)
    best_x, best_cross = None, len(cells)
    lo = int(0.3 * page_width)
    hi = int(0.7 * page_width)
    step = max(2, (hi - lo) // 60)
    for xi in range(lo, hi + 1, step):
        cross = sum(1 for c in cells if c.l < xi < c.r)
        if cross < best_cross or (
                cross == best_cross
                and abs(xi - page_width / 2) < abs(
                    (best_x or 0) - page_width / 2)):
            best_x, best_cross = xi, cross
    mid = float(best_x if best_x is not None else page_width / 2.0)
    left, right, spanning = [], [], []
    slack = 0.08 * page_width
    for c in cells:
        if c.r <= mid + 2:
            left.append(c)
        elif c.l >= mid - 2:
            right.append(c)
        elif c.r - mid <= slack and c.l < mid:
            # a justified line poking slightly past the gutter is still a
            # column member, not a full-width zone break
            left.append(c)
        elif mid - c.l <= slack and c.r > mid:
            right.append(c)
        else:
            spanning.append(c)
    if (len(left) < 5 or len(right) < 5
            or len(spanning) > 0.2 * len(cells)):
        return cells
    # vertical zones: spanning cells act as column breaks
    breaks = sorted(spanning, key=lambda c: c.t)
    zones = []
    prev_bottom = float("-inf")
    for b in breaks:
        zones.append((prev_bottom, b.t, None))
        zones.append((b.t, b.b, b))
        prev_bottom = b.b
    zones.append((prev_bottom, float("inf"), None))
    for c in left:
        c.col = 0
    for c in right:
        c.col = 1
    out = []
    for top, bottom, brk in zones:
        if brk is not None:
            out.append(brk)
            continue
        def _in(c):
            cy = (c.t + c.b) / 2.0
            return top <= cy < bottom
        out.extend([c for c in left if _in(c)])
        out.extend([c for c in right if _in(c)])
    return out


def convert_pdf(raw: bytes, name: str = "file", filename: str = "",
                binary_hash: int = 0, page_range=None,
                heading_hierarchy: bool = False,
                password: str = "") -> Doc:
    """PDF bytes -> Doc with per-item provenance.

    Pure function of the bytes (Spark UDF contract). ``page_range``
    mirrors the reference's page-range pushdown
    (``pdf_backend.py:59-105``). ``heading_hierarchy`` opt-in mirrors
    HeadingHierarchyOptions(enabled) [default False, like the
    reference]: assign SectionHeaderItem.level from PDF bookmarks >
    numbering > style (``heading_hierarchy_model.py:427-471``).
    """
    doc = Doc(name, filename=filename or f"{name}.pdf",
              binary_hash=binary_hash, mimetype="application/pdf")
    pages = extract_page_cells(raw, page_range=page_range, with_images=True,
                               password=password, with_paths=True)
    for page_no, width, height, cells, image_rects, path_rects in pages:
        doc.pages[page_no] = (width, height)
        if not cells and not image_rects:
            continue
        body_size = _body_font_size(cells)
        # multi-image figure regions absorb the small label texts drawn
        # inside them (the reference's layout model emits one picture
        # cluster for the whole diagram)
        image_rects, fig_regions = _cluster_figures(
            _dedup_rects(image_rects), midline=width / 2.0)
        if fig_regions:
            def _in_fig(c):
                # only short label-like lines are part of the diagram;
                # full paragraph lines overlapping the region are body
                # text flowing beside/through it
                if len(c.text) > 40 or len(c.text.split()) > 5:
                    return False
                for (fl, ft, fr, fb) in fig_regions:
                    if (c.l >= fl - 2 and c.r <= fr + 2
                            and c.t >= ft - 10 and c.b <= fb + 16):
                        return True
                return False
            cells = [c for c in cells if not _in_fig(c)]
            if not cells:
                continue
        table_regions, used = _detect_tables(cells, body_size)
        table_regions = _expand_tables_by_rules(table_regions, path_rects)
        flow_cells = [c for c in cells if id(c) not in used]
        flow_cells = _order_columns(flow_cells, width)
        blocks = _merge_into_blocks(flow_cells, body_size,
                                    fig_regions=fig_regions)
        _classify(blocks, body_size, page_no, height, width,
                  is_first_page=(page_no == pages[0][0]))
        blocks = _captions_after_code(blocks)
        blocks = _merge_across_figures(blocks, fig_regions)
        tables = sorted(table_regions, key=lambda r: r[0])
        ti = 0

        def _flush_tables(up_to_t):
            nonlocal ti, list_group
            while ti < len(tables) and tables[ti][0] <= up_to_t:
                tt, tb, tl, tr, tdata = tables[ti]
                tbl = doc.add_table(data=tdata, prov=[{
                    "page_no": page_no,
                    "bbox": {"l": round(tl, 3),
                             "t": round(height - tt, 3),
                             "r": round(tr, 3),
                             "b": round(height - tb, 3),
                             "coord_origin": "BOTTOMLEFT"},
                    "charspan": [0, 0],
                }])
                # a "Table N." paragraph directly preceding attaches as
                # the table's caption (md prints caption first either
                # way; doctags nests it inside <otsl>)
                if doc.body.children[:-1]:
                    prev = doc.resolve(doc.body.children[-2])
                    if (isinstance(prev, TextItem)
                            and type(prev) is TextItem
                            and prev.label == "text"
                            and _TABLE_CAP_RE.match(prev.text)):
                        prev.label = "caption"
                        tbl.captions.append(prev.self_ref)
                ti += 1
                list_group = None
        # pictures interleave into reading order by top edge; dedup
        # overlapping draws of the same bitmap (tiled/clipped repaints)
        # flush order: a picture emits once the text flow has passed its
        # BOTTOM edge (captions below a figure then claim it first, like
        # the reference's caption-to-picture mapping)
        pics = sorted(image_rects, key=lambda r: (r[3], r[0]))
        page_has_cols = any(getattr(c, "col", None) is not None
                            for c in flow_cells)

        def _pic_col(pl, pr):
            if not page_has_cols:
                return None
            center = (pl + pr) / 2.0
            return 0 if center < width / 2.0 else 1

        def _blk_col(blk):
            cols_ = [c.col for c in blk.cells
                     if getattr(c, "col", None) is not None]
            if not cols_:
                return None
            return max(set(cols_), key=cols_.count)

        def _flush_pics(up_to_t, _list_reset, col=None):
            # pictures flush within their own page column (the reading
            # order walks left column then right; a right-column figure
            # must not interleave into left-column text)
            nonlocal list_group
            k = 0
            while k < len(pics):
                pl, pt, pr, pb = pics[k]
                if pb > up_to_t:
                    break  # sorted by bottom
                pcol = _pic_col(pl, pr)
                if col is not None and pcol is not None and pcol != col:
                    k += 1
                    continue
                doc.add_picture(prov=[{
                    "page_no": page_no,
                    "bbox": {"l": round(pl, 3), "t": round(height - pt, 3),
                             "r": round(pr, 3), "b": round(height - pb, 3),
                             "coord_origin": "BOTTOMLEFT"},
                    "charspan": [0, 0],
                }])
                pics.pop(k)
                if _list_reset:
                    list_group = None

        list_group = None
        last_code = None
        for blk in blocks:
            raw_lines = _block_lines(blk)
            text = sanitize_text(raw_lines)
            if not text:
                continue
            l, t, r, b = blk.prov_bbox()
            # a "Figure N/Table N" line adjacent to a drawn bitmap is its
            # caption: attach to the picture item (docling serializes the
            # caption, then the <!-- image --> marker) instead of emitting
            # a standalone paragraph + unmoored image
            if (blk.label == "text" and _CAPTION_RE.match(text)
                    and len(blk.cells) <= 2):
                adj = None
                for k, (pl, pt, pr, pb) in enumerate(pics):
                    if (abs(t - pb) < 0.08 * height
                            or abs(pt - b) < 0.08 * height):
                        adj = k
                        break
                if adj is not None:
                    pl, pt, pr, pb = pics.pop(adj)
                    cap_item = doc.add_text(label="caption", text=text,
                                            prov=[{
                        "page_no": page_no,
                        "bbox": {"l": round(l, 3),
                                 "t": round(height - t, 3),
                                 "r": round(r, 3),
                                 "b": round(height - b, 3),
                                 "coord_origin": "BOTTOMLEFT"},
                        "charspan": [0, len(text)],
                    }])
                    doc.add_picture(caption=cap_item, prov=[{
                        "page_no": page_no,
                        "bbox": {"l": round(pl, 3),
                                 "t": round(height - pt, 3),
                                 "r": round(pr, 3),
                                 "b": round(height - pb, 3),
                                 "coord_origin": "BOTTOMLEFT"},
                        "charspan": [0, 0],
                    }])
                    list_group = None
                    continue
            _flush_tables(blk.bbox()[1])
            _flush_pics(blk.bbox()[1], blk.label != "list_item",
                        col=_blk_col(blk))
            if blk.label not in ("list_item", "glyph_list_item"):
                list_group = None
            prov = [{
                "page_no": page_no,
                "bbox": {"l": round(l, 3), "t": round(height - t, 3),
                         "r": round(r, 3), "b": round(height - b, 3),
                         "coord_origin": "BOTTOMLEFT"},
                "charspan": [0, len(text)],
            }]
            if blk.label == "title":
                doc.add_title(text, prov=prov)
            elif blk.label == "section_header":
                doc.add_heading(text, level=1, prov=prov)
            elif blk.label == "glyph_list_item":
                if list_group is None:
                    list_group = doc.add_list_group()
                doc.add_list_item(text, marker="", enumerated=False,
                                  parent=list_group, prov=prov)
            elif blk.label == "list_item":
                marker_m = _BULLET_RE.match(text)
                marker = marker_m.group(0).strip() if marker_m else ""
                body = text[marker_m.end():] if marker_m else text
                if list_group is None:
                    list_group = doc.add_list_group()
                doc.add_list_item(body, marker=marker,
                                  enumerated=marker[:1].isdigit(),
                                  parent=list_group, prov=prov)
            elif blk.label == "code":
                last_code = doc.add_code(text, prov=prov)
            elif blk.label == "code_caption":
                cap = doc.add_text(label="caption", text=text, prov=prov)
                if last_code is not None:
                    last_code.captions.append(cap.self_ref)
            elif blk.label == "formula":
                doc.add_text(label="formula", text="", orig="", prov=prov)
            elif blk.label in ("page_header", "page_footer"):
                doc.add_text(label=blk.label, text=text,
                             content_layer="furniture", prov=prov)
            else:
                doc.add_text(label="text", text=text, prov=prov)
        _flush_tables(float("inf"))
        _flush_pics(float("inf"), True)  # leftovers, any column
    if heading_hierarchy:
        from .headings import apply_heading_hierarchy
        from .pdfio import PdfDocument
        try:
            outline = PdfDocument(raw, password=password).outline()
        except Exception:
            outline = []
        sizes = {}
        for i, t in enumerate(x for x in doc.texts
                              if type(x).__name__ == "SectionHeaderItem"):
            if t.prov:
                bb = t.prov[0]["bbox"]
                sizes[i] = abs(bb["t"] - bb["b"])
        apply_heading_hierarchy(doc, font_sizes=sizes or None,
                                outline=outline)
    return doc


def _cluster_figures(rects, margin=25.0, midline=None):
    """Merge image rects into figure regions: rects whose margin-expanded
    boxes touch form one cluster (multi-part diagrams draw each sub-image
    separately). Returns (region_rects, multi_regions) where
    multi_regions are the union boxes of >=2-image clusters - the
    reference's layout model emits ONE picture for such a region and
    absorbs the little label texts inside it."""
    n = len(rects)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def side(r):
        if midline is None:
            return 0
        return 0 if (r[0] + r[2]) / 2.0 < midline else 1

    def touch(a, b):
        # figures in different page columns stay separate even when
        # their rects graze the gutter (amt: two side-by-side diagrams)
        if side(a) != side(b):
            return False
        return not (a[2] + margin < b[0] or b[2] + margin < a[0]
                    or a[3] + margin < b[1] or b[3] + margin < a[1])

    for i in range(n):
        for j in range(i + 1, n):
            if touch(rects[i], rects[j]):
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[rb] = ra
    groups: dict[int, list] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(rects[i])
    out, multi = [], []
    for members in groups.values():
        if len(members) >= 2:
            u = (min(m[0] for m in members), min(m[1] for m in members),
                 max(m[2] for m in members), max(m[3] for m in members))
            out.append(u)
            multi.append(u)
        else:
            out.append(members[0])
    return out, multi


def _dedup_rects(rects):
    """Collapse near-identical image rects (repeated draws of one
    bitmap through clip regions)."""
    out = []
    for r in rects:
        dup = False
        for o in out:
            if (abs(r[0] - o[0]) < 3 and abs(r[1] - o[1]) < 3
                    and abs(r[2] - o[2]) < 3 and abs(r[3] - o[3]) < 3):
                dup = True
                break
        if not dup:
            out.append(r)
    return out


# ------------------------------------------------- geometric tables

def _two_deck_header(grp, cols, col_of):
    """Two-deck table header expansion (TableFormer semantics): a leading
    row group whose top line holds a label centered over a run of >=2
    sub-columns splits into TWO header rows - the group label repeats
    across its run in row 1, sub-labels fill row 2, and single-column
    stacks act as rowspan-2 cells (text repeated in both rows).

    Returns cell specs [(text, r0, r1, c0, c1, is_header), ...] over two
    header rows, or None when the group has no such centered group label
    (then the caller collapses the group).
    """
    n_cols = len(cols)
    rows_flat = [[c for c in r] for r in grp]
    top_band = rows_flat[0]
    bot_band = rows_flat[-1]
    top_t = min(c.t for c in top_band)
    bot_t = min(c.t for c in bot_band)
    tops: dict[int, list] = {}
    bots: dict[int, list] = {}
    mids: dict[int, list] = {}
    for r in rows_flat:
        for c in r:
            k = col_of(c)
            if c.t <= top_t + 2.0:
                tops.setdefault(k, []).append(c)
            elif c.t >= bot_t - 2.5:
                bots.setdefault(k, []).append(c)
            else:
                mids.setdefault(k, []).append(c)
    # find a run of >=2 adjacent columns that have bottom sub-labels but
    # share a single top-level label (centered over the run)
    runs = []  # (start_col, end_col, label_text)
    k = 0
    while k < n_cols:
        if k in bots and k not in tops:
            j = k
            labels = []
            while j < n_cols and j in bots:
                if j in tops:
                    if labels:
                        break  # a second label starts its own stack/run
                    labels.extend(tops[j])
                j += 1
            run_cols = list(range(k, j))
            if len(run_cols) >= 2 and len(labels) == 1:
                lab = labels[0]
                span_l = min(cols[run_cols[0]][0], lab.l)
                span_r = max(cols[run_cols[-1]][1], lab.r)
                center = (lab.l + lab.r) / 2.0
                if span_l < center < span_r:
                    runs.append((k, j - 1, lab.text))
            k = j
        else:
            k += 1
    if not runs:
        return None
    specs: list[tuple] = []
    in_run = set()
    for s, e, lab in runs:
        # group label spans the run's columns in row 0
        specs.append((lab, 0, 1, s, e + 1, True))
        for k in range(s, e + 1):
            in_run.add(k)
            sub = " ".join(c.text for c in sorted(
                bots.get(k, []), key=lambda c: c.l))
            specs.append((sub, 1, 2, k, k + 1, True))
    for k in range(n_cols):
        if k in in_run:
            continue
        stack = (tops.get(k, []) + mids.get(k, []) + bots.get(k, []))
        text = " ".join(c.text for c in sorted(
            stack, key=lambda c: (c.t, c.l)))
        # single-column stack: one rowspan-2 header cell
        specs.append((text, 0, 2, k, k + 1, True))
    return specs


def _expand_tables_by_rules(table_regions, path_rects):
    """Grow each detected table's bbox to the drawn RULE LINES that
    frame it: the reference's table region (TableFormer cluster snapped
    by the postprocessor) spans the painted grid, not just the text
    cells - verified against 2305.03393 where the groundtruth rect
    equals the rule union including stroke width to <0.5 loc. Only
    thin painted paths (<= 3 pt in one dimension - rules, not filled
    panels) within 6 pt of the text region participate; one pass is
    enough because frame rules touch the text region directly."""
    if not path_rects:
        return table_regions
    rules = [p for p in path_rects
             if min(p[2] - p[0], p[3] - p[1]) <= 3.0]
    out = []
    for (tt, tb, tl, tr, tdata) in table_regions:
        el, et, er, eb = tl, tt, tr, tb
        for (pl, pt, pr, pb) in rules:
            if pr < el - 6 or pl > er + 6 or pb < et - 6 or pt > eb + 6:
                continue
            el, et = min(el, pl), min(et, pt)
            er, eb = max(er, pr), max(eb, pb)
        out.append((et, eb, el, er, tdata))
    return out


def _detect_tables(cells, body_size):
    """Deterministic table-structure recovery from cell geometry - the
    non-ML stand-in for the reference's TableFormer stage (north-star
    scope: 'TableFormer-style table-structure recovery').

    A table region is >=3 consecutive baseline rows with >=3 cells each
    (two-column page layouts produce 2-cell rows and stay prose).
    Columns come from x-interval clustering of the region's cells.

    Returns (regions, used) where regions = [(top, bottom, TableData)]
    and used = set of cell ids consumed by a table.
    """
    from .model import TableCell, TableData

    # baseline rows
    rows = []
    for c in sorted(cells, key=lambda c: (c.t + c.b) / 2.0):
        if rows:
            last = rows[-1]
            top = min(x.t for x in last)
            bot = max(x.b for x in last)
            ov = min(bot, c.b) - max(top, c.t)
            if ov > 0.5 * min(bot - top, c.b - c.t):
                last.append(c)
                continue
        rows.append([c])
    for r in rows:
        r.sort(key=lambda c: c.l)

    def _table_row(r):
        if len(r) < 3:
            return False
        # bullet/checkbox rows are two-column LISTS side by side, not
        # table rows (questionnaire layouts); same for fill-in blanks
        listy = sum(1 for c in r
                    if _GLYPH_BULLET_RE.match(c.text)
                    or _MARKER_ONLY_RE.match(c.text.strip())
                    or c.text.lstrip().startswith("___"))
        return listy == 0

    marked = [_table_row(r) for r in rows]
    regions = []
    used: set = set()
    i = 0
    while i < len(rows):
        if not marked[i]:
            i += 1
            continue
        # extend the region over marked rows, allowing up to 2 interleaved
        # narrow rows (spanning labels, rowspan stubs) when another marked
        # row follows within vertical reach
        j = i
        while j + 1 < len(rows):
            nxt = None
            for k in range(j + 1, min(j + 4, len(rows))):
                gap = (min(c.t for c in rows[k])
                       - max(c.b for c in rows[j]))
                if gap > 2.5 * body_size:
                    break
                if marked[k]:
                    nxt = k
                    break
            if nxt is None:
                break
            j = nxt
        n_marked = sum(1 for k in range(i, j + 1) if marked[k])
        n_rows = j - i + 1
        if n_marked >= 3:
            region_rows = rows[i:j + 1]
            region_cells = [c for r in region_rows for c in r]
            # column clustering by x-interval overlap
            cols: list[list[float]] = []  # [l, r] running spans
            for c in sorted(region_cells, key=lambda c: c.l):
                placed = False
                for span in cols:
                    if min(span[1], c.r) - max(span[0], c.l) > 0:
                        span[0] = min(span[0], c.l)
                        span[1] = max(span[1], c.r)
                        placed = True
                        break
                if not placed:
                    cols.append([c.l, c.r])
            cols.sort(key=lambda s: s[0])
            n_cols = len(cols)
            if n_cols >= 3:
                def col_of(c):
                    best, best_ov = 0, -1.0
                    for k, span in enumerate(cols):
                        ov = min(span[1], c.r) - max(span[0], c.l)
                        if ov > best_ov:
                            best, best_ov = k, ov
                    return best

                # chain physical rows whose vertical spans overlap into
                # logical row groups (staggered/rowspan layouts write a
                # centered stub BETWEEN its neighbour lines)
                groups: list[list[list]] = []
                for r in region_rows:
                    if groups:
                        pb = max(c.b for rr in groups[-1] for c in rr)
                        if min(c.t for c in r) < pb - 0.5:
                            groups[-1].append(r)
                            continue
                    groups.append([r])

                # specs: (text, r0, r1, c0, c1, is_header)
                specs: list[tuple] = []
                rown = 0
                for gi, grp in enumerate(groups):
                    gcells = [c for r in grp for c in r]
                    if gi == 0 and len(grp) >= 2:
                        deck = _two_deck_header(grp, cols, col_of)
                        if deck is not None:
                            specs.extend(deck)
                            rown = 2
                            continue
                    # collapse the group to one logical row: stack cell
                    # texts per column top-to-bottom (TableFormer merges
                    # multi-line body cells)
                    row_text = ["" for _ in range(n_cols)]
                    for c in sorted(gcells, key=lambda c: (c.t, c.l)):
                        k = col_of(c)
                        row_text[k] = (row_text[k] + " " + c.text).strip()
                    for k in range(n_cols):
                        specs.append((row_text[k], rown, rown + 1,
                                      k, k + 1, rown == 0))
                    rown += 1
                n_rows = rown
                data = TableData(num_rows=n_rows, num_cols=n_cols)
                for text, r0, r1, c0, c1, hdr in specs:
                    data.table_cells.append(TableCell(
                        text=text, row_span=r1 - r0, col_span=c1 - c0,
                        start_row_offset_idx=r0, end_row_offset_idx=r1,
                        start_col_offset_idx=c0, end_col_offset_idx=c1,
                        column_header=hdr))
                top = min(c.t for c in region_cells)
                bottom = max(c.b for c in region_cells)
                left = min(c.l for c in region_cells)
                right = max(c.r for c in region_cells)
                regions.append((top, bottom, left, right, data))
                used.update(id(c) for c in region_cells)
        i = j + 1
    return regions, used
