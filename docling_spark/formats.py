"""Secondary declarative format backends (SURVEY §2.A v5).

Each is a pure function bytes -> Doc sharing the HTML path's document
model/serializers, so format dispatch inside the Spark UDF is one branch.

- CSV: dialect-sniffed table (reference ``backend/csv_backend.py``
  semantics: sniff among ",;\\t|:", fall back to comma; first row is the
  column header; non-uniform rows padded by grid width).
- Markdown: CommonMark-subset parser (headings, paragraphs, ul/ol with
  nesting, fenced code, GFM pipe tables, inline bold/italic/code/links,
  images) -> same Doc model (reference ``backend/md_backend.py``
  semantics for the core constructs).
"""

from __future__ import annotations

import csv
import html as _html
import io
import re
from typing import Optional, Union

from .clean import clean_unicode
from .model import BODY, Doc, Formatting, TableCell, TableData


def _decode(raw: Union[bytes, str]) -> str:
    if isinstance(raw, bytes):
        return raw.decode("utf-8", errors="replace")
    return raw


# -------------------------------------------------------------------- CSV

def convert_csv(raw: Union[bytes, str], name: str = "file",
                filename: str = "", binary_hash: int = 0) -> Doc:
    text = _decode(raw)
    doc = Doc(name=name, filename=filename or f"{name}.csv",
              binary_hash=binary_hash, mimetype="text/csv")
    content = io.StringIO(text)
    head = content.readline()
    try:
        dialect = csv.Sniffer().sniff(head, ",;\t|:")
        if dialect.delimiter not in {",", ";", "\t", "|", ":"}:
            raise csv.Error(f"unknown delimiter {dialect.delimiter}")
    except csv.Error:
        dialect = csv.excel
    content.seek(0)
    try:
        rows = list(csv.reader(content, dialect=dialect, strict=True))
    except csv.Error:
        # stray \r / newline-in-field soup: feed pre-split lines so the
        # reader never sees an embedded newline (UDF never-raise contract)
        try:
            rows = list(csv.reader(text.splitlines()))
        except csv.Error:
            rows = [[ln] for ln in text.splitlines() if ln]
    if not rows:
        return doc
    num_rows = len(rows)
    num_cols = max(len(r) for r in rows)
    data = TableData(num_rows=num_rows, num_cols=num_cols)
    for row_idx, row in enumerate(rows):
        for col_idx, value in enumerate(row):
            data.table_cells.append(TableCell(
                text=str(value), row_span=1, col_span=1,
                start_row_offset_idx=row_idx, end_row_offset_idx=row_idx + 1,
                start_col_offset_idx=col_idx, end_col_offset_idx=col_idx + 1,
                column_header=row_idx == 0, row_header=False,
            ))
    doc.add_table(data=data)
    return doc


# --------------------------------------------------------------- markdown

_FENCE_RE = re.compile(r"^(```+|~~~+)\s*(\S+)?\s*$")
_SETEXT1_RE = re.compile(r"^\s{0,3}=+\s*$")
_SETEXT2_RE = re.compile(r"^\s{0,3}-+\s*$")
_EMPTY_LI_RE = re.compile(r"^\s*(?:[-*+]|\d{1,9}[.)])\s*$")
_EMPTY_HEADING_RE = re.compile(r"^(#{1,6})\s*$")
_INDENT_CODE_RE = re.compile(r"^(?:    |\t)(.*)$")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_OL_RE = re.compile(r"^(\s*)(\d{1,9})[.)]\s+(.*)$")
_UL_RE = re.compile(r"^(\s*)([-*+])\s+(.*)$")
_HR_RE = re.compile(r"^\s{0,3}([-*_])\s*(?:\1\s*){2,}$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)+\|?\s*$")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)(?:\s+\"[^\"]*\")?\)")

# inline tokens: code span, bold, italic, link
_INLINE_TOKEN_RE = re.compile(
    r"(`+)(.+?)\1"              # code
    r"|\*\*\*(.+?)\*\*\*"       # bold+italic
    r"|\*\*(.+?)\*\*"            # bold (**)
    r"|(?<![\w_])__(?!\s)(.+?)(?<!\s)__(?![\w_])"   # bold (__)
    r"|\*(.+?)\*"                # italic (*) - intraword allowed
    r"|(?<![\w_])_(?!\s)(.+?)(?<!\s)_(?![\w_])"     # italic (_)
    r"|\[([^\]]*)\]\(([^)\s]*)(?:\s+\"[^\"]*\")?\)"  # link
)


class _Run:
    __slots__ = ("text", "bold", "italic", "code", "href")

    def __init__(self, text, bold=False, italic=False, code=False, href=None):
        self.text = text
        self.bold = bold
        self.italic = italic
        self.code = code
        self.href = href


def _parse_inline(text: str, bold=False, italic=False,
                  href=None) -> list[_Run]:
    runs: list[_Run] = []
    pos = 0

    def nested(content, **kw):
        merged = dict(bold=bold, italic=italic, href=href)
        merged.update(kw)
        runs.extend(_parse_inline(content, **merged))

    for m in _INLINE_TOKEN_RE.finditer(text):
        if m.start() > pos:
            runs.append(_Run(text[pos:m.start()], bold=bold, italic=italic,
                             href=href))
        if m.group(2) is not None:
            runs.append(_Run(m.group(2), bold=bold, italic=italic,
                             code=True, href=href))
        elif m.group(3) is not None:
            nested(m.group(3), bold=True, italic=True)
        elif m.group(4) is not None:
            nested(m.group(4), bold=True)
        elif m.group(5) is not None:
            nested(m.group(5), bold=True)
        elif m.group(6) is not None:
            nested(m.group(6), italic=True)
        elif m.group(7) is not None:
            nested(m.group(7), italic=True)
        elif m.group(8) is not None:
            nested(m.group(8), href=m.group(9) or None)
        pos = m.end()
    if pos < len(text):
        runs.append(_Run(text[pos:], bold=bold, italic=italic, href=href))
    return [r for r in runs if r.text]


_ESCAPABLE = "\\`*_{}[]()#+.!|<>~-"
# map each escapable char to a private-use sentinel so backslash-escaped
# markers never participate in inline tokenization
_PROTECT = {c: chr(0xE100 + i) for i, c in enumerate(_ESCAPABLE)}
_RESTORE = {v: k for k, v in _PROTECT.items()}
_PROTECT_RE = re.compile(
    r"\\([" + re.escape(_ESCAPABLE) + r"])")
_RESTORE_RE = re.compile("[" + "".join(_RESTORE) + "]")


def _protect(text: str) -> str:
    return _PROTECT_RE.sub(lambda m: _PROTECT[m.group(1)], text)


def _unescape(text: str) -> str:
    text = _RESTORE_RE.sub(lambda m: _RESTORE[m.group(0)], text)
    return _html.unescape(text)


class MarkdownConverter:
    """Line-oriented CommonMark-subset parser -> Doc."""

    def convert(self, raw: Union[bytes, str], name: str = "file",
                filename: str = "", binary_hash: int = 0) -> Doc:
        text = _decode(raw).replace("\r\n", "\n").replace("\r", "\n")
        text = _protect(text)
        # "text/markdown" matches the CURRENT reference md backend
        # (md_backend.py:687); its shipped yaml/json groundtruth carries
        # text/html from an older generation run - those goldens are
        # verified item-level (verify_docitems), not byte-level, so the
        # current code is the authority
        doc = Doc(name=name, filename=filename or f"{name}.md",
                  binary_hash=binary_hash, mimetype="text/markdown")
        self.doc = doc
        self.parents: list = [None] * 10   # heading hierarchy stack
        self.level = 0
        lines = text.split("\n")
        i = 0
        para: list[str] = []

        def flush_para():
            nonlocal para
            if para:
                self._emit_paragraph(" ".join(para))
                para = []

        while i < len(lines):
            line = lines[i]
            stripped = line.strip()

            # setext heading closing a pending paragraph
            if para and _SETEXT1_RE.match(line):
                text = " ".join(para); para = []
                self._emit_heading(1, _unescape(text))
                i += 1
                continue
            if para and _SETEXT2_RE.match(line):
                text = " ".join(para); para = []
                self._emit_heading(2, _unescape(text))
                i += 1
                continue

            # HTML comment block: consume and drop
            if not para and stripped.startswith("<!--"):
                while i < len(lines) and "-->" not in lines[i]:
                    i += 1
                i += 1
                continue

            # HTML block: consume until blank line, delegate to the HTML
            # walk so embedded lists/tables become real items (the
            # reference's md backend does the same via its HTML backend)
            if not para and stripped.startswith("<") and re.match(
                    r"^<[A-Za-z]", stripped):
                block = []
                while i < len(lines) and lines[i].strip():
                    block.append(lines[i])
                    i += 1
                self._walk_html_fragment("\n".join(block))
                continue

            # indented code block (4 spaces / tab), only outside a
            # paragraph and not a list item (tab-indented sublists!)
            if (not para and _INDENT_CODE_RE.match(line) and stripped
                    and not _UL_RE.match(line) and not _OL_RE.match(line)
                    and not _EMPTY_LI_RE.match(line)):
                body = []
                while i < len(lines):
                    m = _INDENT_CODE_RE.match(lines[i])
                    if m:
                        body.append(m.group(1))
                    elif not lines[i].strip():
                        body.append("")
                    else:
                        break
                    i += 1
                while body and not body[-1]:
                    body.pop()
                doc.add_code(text=_unescape("\n".join(body)).strip(),
                             parent=self.parents[self.level])
                continue

            fence = _FENCE_RE.match(stripped)
            if fence:
                flush_para()
                marker = fence.group(1)
                lang = fence.group(2) or "unknown"
                body = []
                i += 1
                while i < len(lines) and not lines[i].strip().startswith(
                        marker[:3]):
                    body.append(lines[i])
                    i += 1
                i += 1  # skip closing fence
                code_text = _unescape("\n".join(body)).strip()
                if code_text:
                    doc.add_code(text=code_text, code_language=lang,
                                 parent=self.parents[self.level])
                continue

            if not stripped:
                flush_para()
                i += 1
                continue

            m = _HEADING_RE.match(line)
            if m:
                flush_para()
                self._emit_heading(len(m.group(1)), _unescape(m.group(2)))
                i += 1
                continue
            m = _EMPTY_HEADING_RE.match(stripped)
            if m:
                flush_para()
                self._emit_heading(len(m.group(1)), "")
                i += 1
                continue
            if _EMPTY_LI_RE.match(line):
                flush_para()
                i += 1
                continue

            if _HR_RE.match(stripped):
                flush_para()
                i += 1
                continue

            # GFM table: header row + separator row
            if ("|" in stripped and i + 1 < len(lines)
                    and _TABLE_SEP_RE.match(lines[i + 1])):
                flush_para()
                i = self._emit_table(lines, i)
                continue

            if _UL_RE.match(line) or _OL_RE.match(line):
                flush_para()
                i = self._emit_list(lines, i)
                continue

            img = _IMG_RE.match(stripped)
            if img and img.end() == len(stripped):
                flush_para()
                caption_item = None
                if img.group(1):
                    caption_item = doc.add_text(
                        label="caption", text=img.group(1))
                doc.add_picture(caption=caption_item,
                                parent=self.parents[self.level])
                i += 1
                continue

            para.append(stripped)
            i += 1
        flush_para()
        return doc

    def _walk_html_fragment(self, fragment: str) -> None:
        """Delegate an embedded HTML block to the HTML extractor's walk,
        attaching items to the current markdown parent."""
        from .dom import parse_html
        from .extractor import HtmlExtractor
        root = parse_html(fragment)
        ex = HtmlExtractor()
        ex._reset_state(self.doc)
        ex.level = self.level
        for k in range(min(len(self.parents), ex.MAX_LEVELS)):
            ex.parents[k] = self.parents[k]
        ex._walk(root)

    # -- emitters -------------------------------------------------------
    def _emit_heading(self, level: int, text: str) -> None:
        """FLAT tree: the reference md backend threads ``parent_item``
        through the marko AST recursion, so headings never become parents
        of following siblings - every top-level block hangs off body
        (``md_backend.py:368-398``, yaml groundtruth body.children).
        A single fully-formatted run is stripped into Formatting flags on
        the heading itself (``md_backend.py:466-475`` Emphasis handling);
        the md serializer re-emits the markers, keeping export identical.
        """
        doc = self.doc
        text = text.strip()
        runs = _parse_inline(text)

        def _mk(txt, fmt=None, href=None):
            if level == 1:
                return doc.add_title(txt, formatting=fmt, hyperlink=href)
            return doc.add_heading(txt, level=level - 1,
                                   formatting=fmt, hyperlink=href)

        if len(runs) > 1:
            item = _mk("")
            inline = doc.add_inline_group(parent=item)
            for r in runs:
                seg = r.text.strip()
                if not seg:
                    continue
                fmt = (Formatting(bold=r.bold, italic=r.italic)
                       if (r.bold or r.italic) else None)
                if r.code:
                    doc.add_code(text=seg, parent=inline, formatting=fmt)
                else:
                    doc.add_text(label="text", text=seg, parent=inline,
                                 formatting=fmt, hyperlink=r.href)
        elif runs:
            r = runs[0]
            fmt = (Formatting(bold=r.bold, italic=r.italic)
                   if (r.bold or r.italic) else None)
            _mk(r.text.strip(), fmt, r.href)
        else:
            _mk("")

    def _runs_to_items(self, text: str, parent) -> None:
        doc = self.doc
        runs = _parse_inline(text)
        simple = len(runs) == 1
        target = parent
        if not simple:
            target = doc.add_inline_group(parent=parent)
        for r in runs:
            seg = _unescape(r.text.strip())
            if not seg:
                continue
            fmt = None
            if r.bold or r.italic:
                fmt = Formatting(bold=r.bold, italic=r.italic)
            if r.code:
                doc.add_code(text=seg, parent=target, formatting=fmt,
                             hyperlink=r.href)
            else:
                doc.add_text(label="text", text=seg, parent=target,
                             formatting=fmt, hyperlink=r.href)

    def _emit_paragraph(self, text: str) -> None:
        self._runs_to_items(text, self.parents[self.level])

    def _emit_list(self, lines: list[str], i: int) -> int:
        doc = self.doc
        stack: list[tuple[int, object]] = []  # (indent, group)

        def open_group(indent: int, ordered: bool, start: Optional[int],
                       parent) -> None:
            name = "list"
            if ordered:
                name = "ordered list" + (
                    f" start {start}"
                    if start is not None and start != 1 else "")
            group = doc.add_list_group(name=name, parent=parent)
            stack.append((indent, group))

        last_item = None
        m0_ol = _OL_RE.match(lines[i])
        m0_ul = _UL_RE.match(lines[i])
        root_symbol = "#" if m0_ol else (m0_ul.group(2) if m0_ul else "-")
        while i < len(lines):
            line = lines[i]
            if not line.strip():
                # skip blank runs as long as the list continues afterwards
                j = i
                while j < len(lines) and not lines[j].strip():
                    j += 1
                if j < len(lines) and (_UL_RE.match(lines[j])
                                       or _OL_RE.match(lines[j])):
                    i = j
                    continue
                break
            m_ol = _OL_RE.match(line)
            m_ul = _UL_RE.match(line)
            if not (m_ol or m_ul):
                break
            if m_ol:
                indent = len(m_ol.group(1))
                ordered = True
                number = int(m_ol.group(2))
                body = m_ol.group(3)
                symbol = "#"
            else:
                indent = len(m_ul.group(1))
                ordered = False
                number = None
                body = m_ul.group(3)
                symbol = m_ul.group(2)

            # CommonMark: changing the list type or bullet symbol at the
            # root indent starts a NEW list block
            if stack and indent <= stack[0][0] and symbol != root_symbol:
                break

            while stack and indent < stack[-1][0]:
                stack.pop()
            if not stack or indent > stack[-1][0]:
                parent = (last_item if stack and last_item is not None
                          else self.parents[self.level])
                open_group(indent, ordered, number, parent)
            group = stack[-1][1]

            clean = _unescape(re.sub(r"\s+", " ", body).strip())
            # text that would re-parse as an enumerator gets a protective
            # space at PARSE time ("2\. x" -> "2 . x", per the
            # mixed_without_h1 groundtruth doc dump)
            clean = re.sub(r"^(\d+)\.", r"\1 .", clean)
            runs = _parse_inline(body)
            if len(runs) > 1:
                item = doc.add_list_item(
                    text="", enumerated=ordered,
                    marker=f"{number}." if ordered and number not in (None, 1)
                    and "start" in getattr(group, "name", "") else "",
                    parent=group)
                inline = doc.add_inline_group(parent=item)
                for r in runs:
                    seg = _unescape(r.text.strip())
                    if not seg:
                        continue
                    fmt = (Formatting(bold=r.bold, italic=r.italic)
                           if (r.bold or r.italic) else None)
                    if r.code:
                        doc.add_code(text=seg, parent=inline)
                    else:
                        doc.add_text(label="text", text=seg, parent=inline,
                                     formatting=fmt, hyperlink=r.href)
            elif runs:
                # single fully-formatted run: markers strip into
                # Formatting flags on the item (reference md_backend
                # Emphasis/StrongEmphasis handling); serializer re-emits
                r = runs[0]
                seg = _unescape(re.sub(r"\s+", " ", r.text).strip())
                seg = re.sub(r"^(\d+)\.", r"\1 .", seg)
                fmt = (Formatting(bold=r.bold, italic=r.italic)
                       if (r.bold or r.italic) else None)
                item = doc.add_list_item(
                    text=seg, enumerated=ordered,
                    marker="", parent=group, formatting=fmt,
                    hyperlink=r.href)
            else:
                item = doc.add_list_item(
                    text=clean, enumerated=ordered,
                    marker="", parent=group)
            last_item = item
            i += 1
        return i

    def _emit_table(self, lines: list[str], i: int) -> int:
        doc = self.doc

        def split_row(line: str) -> list[str]:
            s = line.strip()
            if s.startswith("|"):
                s = s[1:]
            if s.endswith("|"):
                s = s[:-1]
            # split on unescaped pipes
            return [c.strip().replace("\\|", "|")
                    for c in re.split(r"(?<!\\)\|", s)]

        header = split_row(lines[i])
        rows = [header]
        i += 2  # skip separator
        while i < len(lines) and "|" in lines[i] and lines[i].strip():
            rows.append(split_row(lines[i]))
            i += 1
        num_rows = len(rows)
        num_cols = max(len(r) for r in rows)
        data = TableData(num_rows=num_rows, num_cols=num_cols)
        for r_idx, row in enumerate(rows):
            for c_idx in range(num_cols):
                text = row[c_idx] if c_idx < len(row) else ""
                cell_runs = _parse_inline(text)
                plain = " ".join(r.text.strip() for r in cell_runs
                                 if r.text.strip())
                data.table_cells.append(TableCell(
                    text=_unescape(plain), row_span=1,
                    col_span=1,
                    start_row_offset_idx=r_idx, end_row_offset_idx=r_idx + 1,
                    start_col_offset_idx=c_idx, end_col_offset_idx=c_idx + 1,
                    column_header=r_idx == 0, row_header=False))
        doc.add_table(data=data, parent=self.parents[self.level])
        return i


def convert_markdown(raw: Union[bytes, str], name: str = "file",
                     filename: str = "", binary_hash: int = 0) -> Doc:
    return MarkdownConverter().convert(raw, name=name, filename=filename,
                                       binary_hash=binary_hash)


# ---------------------------------------------------------------- WebVTT

_VTT_TS_RE = re.compile(
    r"(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})")
_VTT_TAG_RE = re.compile(r"<(/?)([^>\s.]+)((?:\.[^>\s]*)*)(?:\s+([^>]*))?>")


def _vtt_seconds(token: str) -> Optional[float]:
    m = _VTT_TS_RE.match(token.strip())
    if not m:
        return None
    h = int(m.group(1) or 0)
    return h * 3600 + int(m.group(2)) * 60 + int(m.group(3)) + \
        int(m.group(4)) / 1000.0


def convert_vtt(raw: Union[bytes, str], name: str = "file",
                filename: str = "", binary_hash: int = 0) -> Doc:
    """WebVTT cues -> text items with track provenance
    (reference ``backend/webvtt_backend.py`` semantics: one text item per
    payload paragraph; multi-run cues become 'WebVTT cue span' inline
    groups; items carry source=[{kind: track, start/end, identifier?,
    voice?}])."""
    text = _decode(raw).lstrip("﻿")
    doc = Doc(name=name, filename=filename or f"{name}.vtt",
              binary_hash=binary_hash, mimetype="text/vtt")
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].startswith("WEBVTT"):
        return doc
    title = lines[0][6:].strip(" \t-")
    if title:
        doc.add_title(title)

    # split into blocks on blank lines
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines[1:]:
        if ln.strip():
            cur.append(ln)
        elif cur:
            blocks.append(cur)
            cur = []
    if cur:
        blocks.append(cur)

    for block in blocks:
        head = block[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        identifier = None
        idx = 0
        if "-->" not in block[0]:
            identifier = block[0].strip()
            idx = 1
        if idx >= len(block) or "-->" not in block[idx]:
            continue
        timing = block[idx]
        left, _, right = timing.partition("-->")
        start = _vtt_seconds(left)
        end = _vtt_seconds(right.strip().split(" ")[0] if right.strip()
                           else "")
        if start is None or end is None:
            continue
        payload = "\n".join(block[idx + 1:])

        # tokenize cue payload: paragraphs (on newline), runs with
        # voice/formatting state from the tag stack
        pars: list[list[_Run]] = [[]]
        state: list[tuple[str, Optional[str], bool, bool, bool]] = []
        # state entries: (tag, voice, bold, italic, underline)

        def cur_meta():
            voice = None
            bold = italic = underline = False
            for tag, v, b, i_, u in state:
                if v is not None:
                    voice = v
                bold = bold or b
                italic = italic or i_
                underline = underline or u
            return voice, bold, italic, underline

        pos = 0
        for m in _VTT_TAG_RE.finditer(payload):
            if m.start() > pos:
                seg = payload[pos:m.start()]
                voice, bold, italic, underline = cur_meta()
                parts = seg.split("\n")
                for pi, part in enumerate(parts):
                    if pi > 0:
                        pars.append([])
                    if part:
                        run = _Run(_html.unescape(part), bold=bold,
                                   italic=italic)
                        run.href = None
                        pars[-1].append((run, voice, underline))
            closing, tag, _classes, annotation = m.groups()
            if closing:
                for k in range(len(state) - 1, -1, -1):
                    if state[k][0] == tag:
                        del state[k:]
                        break
            else:
                if tag == "v":
                    state.append((tag, (annotation or "").strip() or None,
                                  False, False, False))
                elif tag == "b":
                    state.append((tag, None, True, False, False))
                elif tag == "i":
                    state.append((tag, None, False, True, False))
                elif tag == "u":
                    state.append((tag, None, False, False, True))
                else:  # c, lang, ruby, rt ... transparent wrappers
                    state.append((tag, None, False, False, False))
            pos = m.end()
        if pos < len(payload):
            seg = payload[pos:]
            voice, bold, italic, underline = cur_meta()
            for pi, part in enumerate(seg.split("\n")):
                if pi > 0:
                    pars.append([])
                if part:
                    run = _Run(_html.unescape(part), bold=bold, italic=italic)
                    pars[-1].append((run, voice, underline))

        for par in pars:
            if not par:
                continue

            def track(voice):
                t = {"kind": "track", "start_time": start, "end_time": end}
                if identifier:
                    t["identifier"] = identifier
                if voice:
                    t["voice"] = voice
                return [t]

            if len(par) == 1:
                run, voice, underline = par[0]
                fmt = (Formatting(bold=run.bold, italic=run.italic,
                                  underline=underline)
                       if (run.bold or run.italic or underline) else None)
                doc.add_text(label="text", text=run.text,
                             formatting=fmt, source=track(voice))
            else:
                group = doc.add_inline_group(name="WebVTT cue span")
                for run, voice, underline in par:
                    fmt = (Formatting(bold=run.bold, italic=run.italic,
                                      underline=underline)
                           if (run.bold or run.italic or underline)
                           else None)
                    doc.add_text(label="text", text=run.text,
                                 formatting=fmt, parent=group,
                                 source=track(voice))
    return doc


# ------------------------------------------------------------------ EPUB

def convert_epub(raw: Union[bytes, str], name: str = "file",
                 filename: str = "", binary_hash: int = 0) -> Doc:
    """EPUB = zip of XHTML chapters; spine order from content.opf.

    Composes over the HTML operator (reference ``backend/epub_backend.py``
    semantics): chapter bodies concatenated into one HTML document,
    internal chapter#anchor links flattened, HTML conversion with
    add_title=False / infer_furniture=False, origin rewritten to the epub.
    """
    import xml.etree.ElementTree as ET
    import zipfile

    from .extractor import HtmlExtractor

    if isinstance(raw, str):
        raw = raw.encode("utf-8")
    empty = Doc(name=name, filename=filename or f"{name}.epub",
                binary_hash=binary_hash, mimetype="application/epub+zip")
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception:
        return empty
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
        ns = {"container": "urn:oasis:names:tc:opendocument:xmlns:container"}
        rootfile = container.find(".//container:rootfile", ns)
        opf_path = rootfile.get("full-path")
        opf = ET.fromstring(zf.read(opf_path))
        import posixpath as _pp
        opf_dir = _pp.dirname(opf_path)
        ns_opf = {"opf": "http://www.idpf.org/2007/opf"}
        spine = opf.find(".//opf:spine", ns_opf)
        manifest = opf.find(".//opf:manifest", ns_opf)
        manifest_map = {
            item.get("id"): item.get("href")
            for item in manifest.findall("opf:item", ns_opf)
            if item.get("id") and item.get("href")
        }
        content_files = []
        for itemref in spine.findall("opf:itemref", ns_opf):
            href = manifest_map.get(itemref.get("idref"))
            if href:
                content_files.append(f"{opf_dir}/{href}" if opf_dir else href)
    except Exception:
        return empty

    parts = ['<!DOCTYPE html><html><head><meta charset="utf-8"/></head><body>']
    for content_file in content_files:
        try:
            xhtml = zf.read(content_file).decode("utf-8")
        except Exception:
            continue
        m = re.search(r"<body[^>]*>(.*?)</body>", xhtml,
                      re.DOTALL | re.IGNORECASE)
        body = m.group(1) if m else xhtml
        # chapter.xhtml#anchor -> #anchor (single combined document)
        body = re.sub(r'href="([^"]*\.xhtml)(#[^"]*)"', r'href="\2"', body)
        parts.append(body)
    parts.append("</body></html>")
    combined = "\n".join(parts)

    doc = HtmlExtractor(add_title=False, infer_furniture=False).convert(
        combined.encode("utf-8"), name=name,
        filename=filename or f"{name}.epub", binary_hash=binary_hash)
    doc.mimetype = "application/epub+zip"
    return doc


# ----------------------------------------------------------------- email

def convert_email(raw: Union[bytes, str], name: str = "file",
                  filename: str = "", binary_hash: int = 0) -> Doc:
    """RFC-822 email -> title (subject) + From/To/Date lines + body
    paragraphs; HTML parts route through the HTML operator (reference
    ``backend/email_backend.py`` semantics, stdlib ``email`` instead of
    mail-parser)."""
    import email as _email
    import email.policy as _policy

    from .extractor import HtmlExtractor
    from .serialize import to_markdown

    if isinstance(raw, str):
        raw = raw.encode("utf-8")
    doc = Doc(name=name, filename=filename or f"{name}.eml",
              binary_hash=binary_hash, mimetype="message/rfc822")
    try:
        msg = _email.message_from_bytes(raw, policy=_policy.default)
    except Exception:
        return doc

    def split_paragraphs(text: str) -> list[str]:
        return [p.strip() for p in re.split(r"\n\s*\n+", text.strip())
                if p.strip()]

    subject = (msg.get("Subject") or "").strip()
    from_text = (msg.get("From") or "").strip()
    to_text = (msg.get("To") or "").strip()
    date_text = (msg.get("Date") or "").strip()

    plain_parts: list[str] = []
    html_parts: list[str] = []
    for part in msg.walk():
        if part.get_content_maintype() != "text":
            continue
        if part.get_content_disposition() == "attachment":
            continue
        try:
            content = part.get_content()
        except Exception:
            continue
        if part.get_content_subtype() == "plain":
            plain_parts.append(content)
        elif part.get_content_subtype() == "html":
            html_parts.append(content)

    if plain_parts:
        paragraphs = [p for part in plain_parts
                      for p in split_paragraphs(part)]
    elif html_parts:
        paragraphs = []
        for part in html_parts:
            sub = HtmlExtractor(add_title=False,
                                infer_furniture=False).convert(
                part.encode("utf-8"), name="email-body")
            paragraphs.extend(split_paragraphs(to_markdown(sub)))
    else:
        paragraphs = []

    if subject:
        doc.add_title(text=subject)
    if from_text:
        doc.add_text(label="text", text=f"From: {from_text}")
    if to_text:
        doc.add_text(label="text", text=f"To: {to_text}")
    if date_text:
        doc.add_text(label="text", text=f"Date: {date_text}")
    for p in paragraphs:
        doc.add_text(label="text", text=p)
    return doc


# -------------------------------------------------------------- AsciiDoc

_ADOC_CELL_SPEC = r"(?:\d+(?:\.\d+)?[*+])*[<^>]?(?:\.[<^>])?[adehlms]?"
_ADOC_TITLE_RE = re.compile(r"^= ")
_ADOC_SECTION_RE = re.compile(r"^(=+)\s+(.*)")
_ADOC_LIST_RE = re.compile(r"^(\s)*(\*|-|\d+\.|\w+\.) ")
_ADOC_LIST_PARSE_RE = re.compile(r"^(\s*)(\*|-|\d+\.)\s+(.*)")
_ADOC_TABLE_LINE_RE = re.compile(rf"^{_ADOC_CELL_SPEC}\|.*\|")
_ADOC_CELL_STRIP_RE = re.compile(rf"(^|\s){_ADOC_CELL_SPEC}(?=\|)")
_ADOC_PICTURE_RE = re.compile(r"^image::")
_ADOC_CAPTION_RE = re.compile(r"^\.(.+)")


def convert_asciidoc(raw: Union[bytes, str], name: str = "file",
                     filename: str = "", binary_hash: int = 0) -> Doc:
    """AsciiDoc line-regex parser (reference ``backend/asciidoc_backend.py``
    semantics): '=' title / '==+' headings, indent-nested lists, '|' tables
    with cell-spec stripping, image:: macros, '.caption' lines, blank-line
    paragraph flushing."""
    text = _decode(raw)
    doc = Doc(name=name, filename=filename or f"{name}.asciidoc",
              binary_hash=binary_hash, mimetype="text/asciidoc")

    parents: dict[int, object] = {i: None for i in range(10)}
    indents: dict[int, object] = {i: None for i in range(10)}
    in_list = False
    in_table = False
    text_data: list[str] = []
    table_data: list[list[str]] = []
    caption_data: list[str] = []

    def current_level() -> int:
        for k in range(10):
            if parents[k] is None and k > 0:
                return k - 1
        return 0

    def current_parent():
        for k in range(10):
            if parents[k] is None and k > 0:
                return parents[k - 1]
        return None

    def parse_table_line(line: str) -> list[str]:
        line = _ADOC_CELL_STRIP_RE.sub(r"\1", line)
        return [c.strip() for c in line.split("|")[1:]]

    def flush_table(caption_item):
        num_rows = len(table_data)
        num_cols = max((len(r) for r in table_data), default=0)
        data = TableData(num_rows=num_rows, num_cols=num_cols)
        for r, row in enumerate(table_data):
            for c, cell_text in enumerate(row):
                data.table_cells.append(TableCell(
                    text=cell_text, row_span=1, col_span=1,
                    start_row_offset_idx=r, end_row_offset_idx=r + 1,
                    start_col_offset_idx=c, end_col_offset_idx=c + 1,
                    column_header=r == 0, row_header=False))
        table = doc.add_table(data=data, parent=current_parent())
        if caption_item is not None:
            table.captions.append(caption_item.self_ref)

    for line in text.split("\n"):
        if _ADOC_TITLE_RE.match(line):
            parents[0] = doc.add_text(label="title", text=line[2:].strip())
        elif _ADOC_SECTION_RE.match(line) and line.startswith("=="):
            m = _ADOC_SECTION_RE.match(line)
            level = len(m.group(1)) - 1
            parents[level] = doc.add_heading(
                m.group(2).strip(), level=level, parent=parents[level - 1])
            for k in range(10):
                if k > level:
                    parents[k] = None
        elif _ADOC_LIST_RE.match(line):
            m = _ADOC_LIST_PARSE_RE.match(line)
            if m:
                indent = len(m.group(1) or "")
                item_text = m.group(3).strip()
            else:
                indent = 0
                item_text = line
            level = current_level()
            if not in_list:
                in_list = True
                parents[level + 1] = doc.add_list_group(
                    name="list", parent=parents[level])
                indents[level + 1] = indent
            elif indents[level] is not None and indent > indents[level]:
                parents[level + 1] = doc.add_list_group(
                    name="list", parent=parents[level])
                indents[level + 1] = indent
            elif indents[level] is not None and indent < indents[level]:
                while (indents[level] is not None
                       and indent < indents[level]):
                    parents[level] = None
                    indents[level] = None
                    level -= 1
            doc.add_list_item(item_text, parent=current_parent())
        elif in_list and not _ADOC_LIST_RE.match(line):
            in_list = False
            parents[current_level()] = None
        elif line.strip() == "|===" and not in_table:
            in_table = True
        elif _ADOC_TABLE_LINE_RE.match(line):
            in_table = True
            table_data.append(parse_table_line(line))
        elif in_table and (not _ADOC_TABLE_LINE_RE.match(line)
                           or line.strip() == "|==="):
            caption_item = None
            if caption_data:
                caption_item = doc.add_text(
                    label="caption", text=" ".join(caption_data))
            caption_data = []
            flush_table(caption_item)
            in_table = False
            table_data = []
        elif _ADOC_PICTURE_RE.match(line):
            caption_item = None
            if caption_data:
                caption_item = doc.add_text(
                    label="caption", text=" ".join(caption_data))
            caption_data = []
            doc.add_picture(caption=caption_item)
        elif _ADOC_CAPTION_RE.match(line) and not caption_data:
            caption_data.append(_ADOC_CAPTION_RE.match(line).group(1))
        elif line.strip() and caption_data:
            caption_data.append(line.strip())
        elif not line.strip() and text_data:
            doc.add_text(label="paragraph", text=" ".join(text_data),
                         parent=current_parent())
            text_data = []
        elif line.strip():
            text_data.append(line.strip())

    if text_data:
        doc.add_text(label="paragraph", text=" ".join(text_data),
                     parent=current_parent())
    if in_table and table_data:
        flush_table(None)
    return doc
