"""Document model mirroring the DoclingDocument JSON shape.

The reference's output IR (``DoclingDocument`` from docling-core; JSON shape
visible in ``/root/reference/tests/data/html/groundtruth/*.json``) is two
trees (``body``, ``furniture``) over flat arrays (``texts``, ``tables``,
``pictures``, ``groups``) linked by ``$ref`` JSON pointers.  This module
reimplements just that data model plus the ``add_*`` construction API the
extractor needs - no pydantic, plain slotted classes for speed inside
Arrow-batched UDFs.
"""

from __future__ import annotations

from typing import Optional, Union

SCHEMA_NAME = "DoclingDocument"
SCHEMA_VERSION = "1.10.0"

BODY = "body"
FURNITURE = "furniture"


class Formatting:
    __slots__ = ("bold", "italic", "underline", "strikethrough", "script")

    def __init__(self, bold=False, italic=False, underline=False,
                 strikethrough=False, script="baseline"):
        self.bold = bold
        self.italic = italic
        self.underline = underline
        self.strikethrough = strikethrough
        self.script = script

    def __eq__(self, other):
        if not isinstance(other, Formatting):
            return NotImplemented
        return (self.bold, self.italic, self.underline, self.strikethrough,
                self.script) == (other.bold, other.italic, other.underline,
                                 other.strikethrough, other.script)

    def __hash__(self):
        return hash((self.bold, self.italic, self.underline,
                     self.strikethrough, self.script))

    def copy(self) -> "Formatting":
        return Formatting(self.bold, self.italic, self.underline,
                          self.strikethrough, self.script)

    def to_dict(self) -> dict:
        return {
            "bold": self.bold,
            "italic": self.italic,
            "underline": self.underline,
            "strikethrough": self.strikethrough,
            "script": self.script,
        }


class TableCell:
    __slots__ = ("text", "row_span", "col_span", "start_row_offset_idx",
                 "end_row_offset_idx", "start_col_offset_idx",
                 "end_col_offset_idx", "column_header", "row_header",
                 "row_section", "fillable", "ref")

    def __init__(self, text, row_span, col_span, start_row_offset_idx,
                 end_row_offset_idx, start_col_offset_idx, end_col_offset_idx,
                 column_header=False, row_header=False, row_section=False,
                 fillable=False, ref=None):
        self.text = text
        self.row_span = row_span
        self.col_span = col_span
        self.start_row_offset_idx = start_row_offset_idx
        self.end_row_offset_idx = end_row_offset_idx
        self.start_col_offset_idx = start_col_offset_idx
        self.end_col_offset_idx = end_col_offset_idx
        self.column_header = column_header
        self.row_header = row_header
        self.row_section = row_section
        self.fillable = fillable
        self.ref = ref  # RichTableCell group ref ("#/groups/N") or None

    def to_dict(self) -> dict:
        d = {
            "row_span": self.row_span,
            "col_span": self.col_span,
            "start_row_offset_idx": self.start_row_offset_idx,
            "end_row_offset_idx": self.end_row_offset_idx,
            "start_col_offset_idx": self.start_col_offset_idx,
            "end_col_offset_idx": self.end_col_offset_idx,
            "text": self.text,
            "column_header": self.column_header,
            "row_header": self.row_header,
            "row_section": self.row_section,
            "fillable": self.fillable,
        }
        if self.ref is not None:
            d["ref"] = {"$ref": self.ref}
        return d


class TableData:
    __slots__ = ("num_rows", "num_cols", "table_cells")

    def __init__(self, num_rows=0, num_cols=0, table_cells=None):
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.table_cells: list[TableCell] = table_cells or []

    def grid(self) -> list[list[Optional[TableCell]]]:
        g: list[list[Optional[TableCell]]] = [
            [None] * self.num_cols for _ in range(self.num_rows)
        ]
        for cell in self.table_cells:
            for r in range(cell.start_row_offset_idx, cell.end_row_offset_idx):
                for c in range(cell.start_col_offset_idx, cell.end_col_offset_idx):
                    if 0 <= r < self.num_rows and 0 <= c < self.num_cols:
                        g[r][c] = cell
        return g

    def to_dict(self) -> dict:
        grid_out = []
        for r, row in enumerate(self.grid()):
            row_out = []
            for c, cell in enumerate(row):
                if cell is None:
                    # docling-core fills empty grid slots with blank cells
                    # carrying their actual grid position
                    row_out.append(TableCell(
                        text="", row_span=1, col_span=1,
                        start_row_offset_idx=r, end_row_offset_idx=r + 1,
                        start_col_offset_idx=c, end_col_offset_idx=c + 1,
                    ).to_dict())
                else:
                    # the grid view drops the rich-cell ref (kept only in
                    # table_cells, per the groundtruth exports)
                    cd = cell.to_dict()
                    cd.pop("ref", None)
                    row_out.append(cd)
            grid_out.append(row_out)
        return {
            "table_cells": [c.to_dict() for c in self.table_cells],
            "num_rows": self.num_rows,
            "num_cols": self.num_cols,
            "orientation": "rot_0",
            "grid": grid_out,
        }


class NodeItem:
    __slots__ = ("self_ref", "parent_ref", "children", "content_layer",
                 "prov")

    def __init__(self, self_ref: str, parent_ref: Optional[str],
                 content_layer: str = BODY):
        self.self_ref = self_ref
        self.parent_ref = parent_ref
        self.children: list[str] = []
        self.content_layer = content_layer
        # provenance dicts ({page_no, bbox, charspan}) for paginated
        # backends (xlsx); [] keeps the HTML/DOCX exports byte-stable
        self.prov: list = []

    def base_dict(self) -> dict:
        d: dict = {"self_ref": self.self_ref}
        if self.parent_ref is not None:
            d["parent"] = {"$ref": self.parent_ref}
        d["children"] = [{"$ref": r} for r in self.children]
        d["content_layer"] = self.content_layer
        return d


class GroupItem(NodeItem):
    __slots__ = ("name", "label")

    def __init__(self, self_ref, parent_ref, name="group",
                 label="unspecified", content_layer=BODY):
        super().__init__(self_ref, parent_ref, content_layer)
        self.name = name
        self.label = label

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["name"] = self.name
        d["label"] = self.label
        return d


class TextItem(NodeItem):
    __slots__ = ("label", "text", "orig", "formatting", "hyperlink", "kind",
                 "source", "comments")

    def __init__(self, self_ref, parent_ref, label, text, orig=None,
                 formatting=None, hyperlink=None, content_layer=BODY,
                 kind=None, source=None):
        super().__init__(self_ref, parent_ref, content_layer)
        self.label = label
        self.text = text
        self.orig = orig if orig is not None else text
        self.formatting: Optional[Formatting] = formatting
        self.hyperlink: Optional[str] = hyperlink
        self.kind = kind  # field_value texts: read_only | fillable
        self.source = source  # track provenance (WebVTT cues)
        self.comments: list[str] = []  # refs of comment texts targeting this

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["label"] = self.label
        d["prov"] = list(self.prov)
        if self.comments:
            d["comments"] = [{"$ref": r} for r in self.comments]
        if self.source is not None:
            d["source"] = self.source
        d["orig"] = self.orig
        d["text"] = self.text
        if self.formatting is not None:
            d["formatting"] = self.formatting.to_dict()
        if self.hyperlink is not None:
            d["hyperlink"] = self.hyperlink
        if self.kind is not None:
            d["kind"] = self.kind
        return d


class SectionHeaderItem(TextItem):
    __slots__ = ("level",)

    def __init__(self, *args, level=1, **kwargs):
        super().__init__(*args, **kwargs)
        self.level = level

    def to_dict(self) -> dict:
        d = super().to_dict()
        # docling-core puts `level` after text/formatting/hyperlink
        d["level"] = self.level
        return d


class ListItemItem(TextItem):
    __slots__ = ("enumerated", "marker")

    def __init__(self, *args, enumerated=False, marker="", **kwargs):
        super().__init__(*args, **kwargs)
        self.enumerated = enumerated
        self.marker = marker

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["enumerated"] = self.enumerated
        d["marker"] = self.marker
        return d


class CodeItem(TextItem):
    __slots__ = ("code_language", "captions")

    def __init__(self, *args, code_language="unknown", **kwargs):
        super().__init__(*args, **kwargs)
        self.code_language = code_language
        self.captions: list[str] = []

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["captions"] = [{"$ref": r} for r in self.captions]
        d["references"] = []
        d["footnotes"] = []
        d["code_language"] = self.code_language
        return d


class PictureItem(NodeItem):
    __slots__ = ("captions", "meta", "image")

    def __init__(self, self_ref, parent_ref, content_layer=BODY):
        super().__init__(self_ref, parent_ref, content_layer)
        self.captions: list[str] = []
        self.meta = None
        self.image = None  # ImageRef dict: mimetype/dpi/size/uri

    def to_dict(self) -> dict:
        d = self.base_dict()
        # docling-core serializes `meta` right after content_layer
        if self.meta is not None:
            d["meta"] = self.meta
        d["label"] = "picture"
        d["prov"] = list(self.prov)
        d["captions"] = [{"$ref": r} for r in self.captions]
        d["references"] = []
        d["footnotes"] = []
        if self.image is not None:
            d["image"] = self.image
        d["annotations"] = []
        return d


class TableItem(NodeItem):
    __slots__ = ("data", "captions", "comments")

    def __init__(self, self_ref, parent_ref, data: TableData,
                 content_layer=BODY):
        super().__init__(self_ref, parent_ref, content_layer)
        self.data = data
        self.captions: list[str] = []
        self.comments: list[str] = []

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["label"] = "table"
        d["prov"] = list(self.prov)
        if self.comments:
            d["comments"] = [{"$ref": r} for r in self.comments]
        d["captions"] = [{"$ref": r} for r in self.captions]
        d["references"] = []
        d["footnotes"] = []
        d["data"] = self.data.to_dict()
        d["annotations"] = []
        return d


class FieldRegionItem(NodeItem):
    __slots__ = ()

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["label"] = "field_region"
        d["prov"] = list(self.prov)
        return d


class FieldItemItem(NodeItem):
    __slots__ = ()

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["label"] = "field_item"
        d["prov"] = list(self.prov)
        return d


AnyItem = Union[GroupItem, TextItem, PictureItem, TableItem,
                FieldRegionItem, FieldItemItem]


class KeyValueRegionItem(NodeItem):
    """GraphData key-value region (docling-core KeyValueItem): cells are
    key/value nodes, links connect them (XBRL fact graphs)."""

    __slots__ = ("label", "graph", "captions", "references", "footnotes")

    def __init__(self, self_ref, parent_ref, graph=None, content_layer=BODY):
        super().__init__(self_ref, parent_ref, content_layer)
        self.label = "key_value_region"
        self.graph = graph or {"cells": [], "links": []}
        self.captions: list[str] = []
        self.references: list[str] = []
        self.footnotes: list[str] = []

    def to_dict(self) -> dict:
        d = self.base_dict()
        d["label"] = self.label
        d["prov"] = list(self.prov)
        d["captions"] = [{"$ref": r} for r in self.captions]
        d["references"] = [{"$ref": r} for r in self.references]
        d["footnotes"] = [{"$ref": r} for r in self.footnotes]
        d["graph"] = self.graph
        return d


class Doc:
    """DoclingDocument-equivalent container with the ``add_*`` API used by
    the extractor (semantics per docling-core as observed in the reference's
    groundtruth exports)."""

    def __init__(self, name: str, filename: str = "", binary_hash: int = 0,
                 mimetype: str = "text/html"):
        self.name = name
        self.filename = filename or name
        self.binary_hash = binary_hash
        self.mimetype = mimetype
        self.body = GroupItem("#/body", None, name="_root_",
                              label="unspecified", content_layer=BODY)
        self.furniture = GroupItem("#/furniture", None, name="_root_",
                                   label="unspecified", content_layer=FURNITURE)
        self.texts: list[TextItem] = []
        self.groups: list[GroupItem] = []
        self.tables: list[TableItem] = []
        self.pictures: list[PictureItem] = []
        self.field_regions: list[FieldRegionItem] = []
        self.field_items: list[FieldItemItem] = []
        self.key_value_items: list[KeyValueRegionItem] = []
        # page_no -> (width, height) for paginated backends (xlsx)
        self.pages: dict[int, tuple] = {}

    # -- ref helpers ---------------------------------------------------------
    def resolve(self, ref: str) -> AnyItem:
        if ref == "#/body":
            return self.body
        if ref == "#/furniture":
            return self.furniture
        _, kind, idx = ref.split("/")
        return getattr(self, kind)[int(idx)]

    def _parent_ref(self, parent, content_layer: str) -> str:
        # items default to the body tree regardless of content layer -
        # the layer is an attribute, not a tree choice (docling-core
        # behavior visible in every groundtruth JSON)
        if parent is None:
            return "#/body"
        if isinstance(parent, str):
            return parent
        return parent.self_ref

    def _attach(self, item: NodeItem, parent_ref: str) -> None:
        self.resolve(parent_ref).children.append(item.self_ref)

    # -- add API ---------------------------------------------------------
    def add_text(self, label="text", text="", orig=None, parent=None,
                 content_layer=BODY, formatting=None, hyperlink=None,
                 kind=None, source=None, prov=None):
        ref = f"#/texts/{len(self.texts)}"
        pref = self._parent_ref(parent, content_layer)
        item = TextItem(ref, pref, label, text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink,
                        content_layer=content_layer, kind=kind,
                        source=source)
        if prov:
            item.prov = list(prov)
        self.texts.append(item)
        self._attach(item, pref)
        return item

    def add_title(self, text, orig=None, parent=None, content_layer=BODY,
                  formatting=None, hyperlink=None, prov=None):
        return self.add_text(label="title", text=text, orig=orig,
                             parent=parent, content_layer=content_layer,
                             formatting=formatting, hyperlink=hyperlink,
                             prov=prov)

    def add_heading(self, text, orig=None, level=1, parent=None,
                    content_layer=BODY, formatting=None, hyperlink=None,
                    prov=None):
        ref = f"#/texts/{len(self.texts)}"
        pref = self._parent_ref(parent, content_layer)
        item = SectionHeaderItem(ref, pref, "section_header", text, orig=orig,
                                 formatting=formatting, hyperlink=hyperlink,
                                 content_layer=content_layer, level=level)
        if prov:
            item.prov = list(prov)
        self.texts.append(item)
        self._attach(item, pref)
        return item

    def add_list_item(self, text, enumerated=False, marker="", orig=None,
                      parent=None, content_layer=BODY, formatting=None,
                      hyperlink=None, prov=None):
        ref = f"#/texts/{len(self.texts)}"
        pref = self._parent_ref(parent, content_layer)
        item = ListItemItem(ref, pref, "list_item", text, orig=orig,
                            formatting=formatting, hyperlink=hyperlink,
                            content_layer=content_layer,
                            enumerated=enumerated, marker=marker)
        if prov:
            item.prov = list(prov)
        self.texts.append(item)
        self._attach(item, pref)
        return item

    def add_code(self, text, code_language="unknown", orig=None, parent=None,
                 content_layer=BODY, formatting=None, hyperlink=None,
                 prov=None):
        ref = f"#/texts/{len(self.texts)}"
        pref = self._parent_ref(parent, content_layer)
        item = CodeItem(ref, pref, "code", text, orig=orig,
                        formatting=formatting, hyperlink=hyperlink,
                        content_layer=content_layer,
                        code_language=code_language)
        if prov:
            item.prov = list(prov)
        self.texts.append(item)
        self._attach(item, pref)
        return item

    def add_group(self, label="unspecified", name="group", parent=None,
                  content_layer=BODY):
        ref = f"#/groups/{len(self.groups)}"
        pref = self._parent_ref(parent, content_layer)
        item = GroupItem(ref, pref, name=name, label=label,
                         content_layer=content_layer)
        self.groups.append(item)
        self._attach(item, pref)
        return item

    def add_list_group(self, name="list", parent=None, content_layer=BODY):
        return self.add_group(label="list", name=name, parent=parent,
                              content_layer=content_layer)

    def add_inline_group(self, name="group", parent=None,
                         content_layer=BODY):
        return self.add_group(label="inline", name=name, parent=parent,
                              content_layer=content_layer)

    def add_table(self, data: TableData, parent=None, content_layer=BODY,
                  prov=None):
        ref = f"#/tables/{len(self.tables)}"
        pref = self._parent_ref(parent, content_layer)
        item = TableItem(ref, pref, data, content_layer=content_layer)
        if prov:
            item.prov = list(prov)
        self.tables.append(item)
        self._attach(item, pref)
        return item

    def add_table_cell(self, table_item: TableItem, cell: TableCell) -> None:
        table_item.data.table_cells.append(cell)

    def add_key_values(self, graph: dict, parent=None, content_layer=BODY):
        ref = f"#/key_value_items/{len(self.key_value_items)}"
        pref = self._parent_ref(parent, content_layer)
        item = KeyValueRegionItem(ref, pref, graph=graph,
                                  content_layer=content_layer)
        self.key_value_items.append(item)
        self._attach(item, pref)
        return item

    def extend_from(self, other: "Doc") -> None:
        """Concatenate another Doc's body tree into this one
        (DoclingDocument.concatenate semantics): items are re-referenced
        with this doc's index offsets and appended under this body."""
        offsets = {kind: len(getattr(self, kind))
                   for kind in ("texts", "groups", "tables", "pictures",
                                "field_regions", "field_items",
                                "key_value_items")}

        def remap(ref: str) -> str:
            if ref in ("#/body", "#/furniture"):
                return "#/body"
            _, kind, idx = ref.split("/")
            return f"#/{kind}/{int(idx) + offsets[kind]}"

        for kind in offsets:
            for item in getattr(other, kind):
                item.self_ref = remap(item.self_ref)
                item.parent_ref = (remap(item.parent_ref)
                                   if item.parent_ref else "#/body")
                item.children = [remap(r) for r in item.children]
                for attr in ("captions", "references", "footnotes",
                             "comments"):
                    if hasattr(item, attr):
                        setattr(item, attr,
                                [remap(r) for r in getattr(item, attr)])
                # rich table cells point at group subtrees by ref
                data = getattr(item, "data", None)
                if data is not None and hasattr(data, "table_cells"):
                    for cell in data.table_cells:
                        if getattr(cell, "ref", None):
                            cell.ref = remap(cell.ref)
                getattr(self, kind).append(item)
        # furniture-parented items were remapped to #/body above, so their
        # tree roots must be spliced in too or they'd be serialized but
        # unreachable (orphans)
        for r in other.body.children:
            self.body.children.append(remap(r))
        for r in other.furniture.children:
            self.body.children.append(remap(r))
        # merge page provenance targets (collision: ours wins)
        for pno, page in other.pages.items():
            self.pages.setdefault(pno, page)

    def add_field_region(self, parent=None, content_layer=BODY):
        ref = f"#/field_regions/{len(self.field_regions)}"
        pref = self._parent_ref(parent, content_layer)
        item = FieldRegionItem(ref, pref, content_layer=content_layer)
        self.field_regions.append(item)
        self._attach(item, pref)
        return item

    def add_field_item(self, parent=None, content_layer=BODY):
        ref = f"#/field_items/{len(self.field_items)}"
        pref = self._parent_ref(parent, content_layer)
        item = FieldItemItem(ref, pref, content_layer=content_layer)
        self.field_items.append(item)
        self._attach(item, pref)
        return item

    def add_picture(self, caption=None, parent=None, content_layer=BODY,
                    prov=None):
        ref = f"#/pictures/{len(self.pictures)}"
        pref = self._parent_ref(parent, content_layer)
        item = PictureItem(ref, pref, content_layer=content_layer)
        if prov:
            item.prov = list(prov)
        self.pictures.append(item)
        self._attach(item, pref)
        if caption is not None:
            item.captions.append(caption.self_ref)
        return item

    # -- traversal ---------------------------------------------------------
    def iterate_items(self, root: Optional[NodeItem] = None, level: int = 0,
                      layers: tuple = (BODY,)):
        """DFS over the body tree yielding ``(item, level)`` pairs, matching
        docling-core's ``iterate_items``: subtrees whose content_layer is not
        in ``layers`` (default: body only) are skipped entirely."""
        if root is None:
            root = self.body
            yield root, level
        elif root.content_layer in layers:
            yield root, level
        else:
            return
        for child_ref in root.children:
            child = self.resolve(child_ref)
            yield from self.iterate_items(child, level + 1, layers)

    def to_dict(self) -> dict:
        return {
            "schema_name": SCHEMA_NAME,
            "version": SCHEMA_VERSION,
            "name": self.name,
            # docs built without an origin (latex path) omit the key
            **({"origin": {
                "mimetype": self.mimetype,
                "binary_hash": self.binary_hash,
                "filename": self.filename,
            }} if self.mimetype is not None else {}),
            "furniture": {
                "self_ref": "#/furniture",
                "children": [{"$ref": r} for r in self.furniture.children],
                "content_layer": "furniture",
                "name": "_root_",
                "label": "unspecified",
            },
            "body": {
                "self_ref": "#/body",
                "children": [{"$ref": r} for r in self.body.children],
                "content_layer": "body",
                "name": "_root_",
                "label": "unspecified",
            },
            "groups": [g.to_dict() for g in self.groups],
            "texts": [t.to_dict() for t in self.texts],
            "pictures": [p.to_dict() for p in self.pictures],
            "tables": [t.to_dict() for t in self.tables],
            "key_value_items": [k.to_dict() for k in self.key_value_items],
            "form_items": [],
            # reference exports include these keys only when populated
            **({"field_regions": [f.to_dict() for f in self.field_regions],
                "field_items": [f.to_dict() for f in self.field_items]}
               if self.field_regions else {}),
            "pages": {
                str(n): {"size": {"width": float(w), "height": float(h)},
                         "page_no": n}
                for n, (w, h) in sorted(self.pages.items())
            },
        }
