"""EBCDIC data-file backend: mainframe records + JSON layout -> Doc.

Reimplements the semantics of the reference's EBCDIC backend
(``/root/reference/docling/backend/ebcdic_backend.py``): a JSON layout
(COBOL-copybook-like) describes header/footer bytes, an optional
length/type record prefix, and per-schema fixed-width fields typed as
string / integer / unsigned_integer / packed_decimal (COMP-3) /
zoned_decimal / skip. Every record schema becomes a table with a
field-name header row; multi-schema files get one heading per schema.

Character data decodes with a configurable EBCDIC codec (default
``cp037``); control characters are stripped. Packed and zoned decimals
honor the 0xB/0xD negative sign nibbles, and ``scale`` shifts the
decimal point like the ``V`` of a COBOL picture clause.
"""

from __future__ import annotations

import codecs
import json
import re
from decimal import Decimal
from typing import Optional, Union

from .model import Doc, TableCell, TableData

EBCDIC_MIMETYPE = "application/x-ebcdic"

_CONTROL_CHARACTERS = re.compile(r"[\x00-\x1f\x7f-\x9f]")
_NEGATIVE_SIGNS = frozenset({0xB, 0xD})


class EbcdicDecodeError(ValueError):
    pass


class Field:
    __slots__ = ("name", "size", "type", "scale")

    def __init__(self, name: str, size: int, type: str = "string",
                 scale: int = 0):
        self.name = name
        self.size = int(size)
        self.type = type
        self.scale = int(scale)


class RecordLayout:
    __slots__ = ("name", "fields", "selector")

    def __init__(self, fields: list[Field], name: str = "record",
                 selector: Optional[str] = None):
        self.fields = fields
        self.name = name
        self.selector = selector

    @property
    def size(self) -> int:
        return sum(f.size for f in self.fields)


class Layout:
    __slots__ = ("records", "description", "header_size", "footer_size",
                 "record_length_field", "record_type_field")

    def __init__(self, records, description="", header_size=0,
                 footer_size=0, record_length_field=None,
                 record_type_field=None):
        self.records: list[RecordLayout] = records
        self.description = description
        self.header_size = int(header_size)
        self.footer_size = int(footer_size)
        self.record_length_field: Optional[Field] = record_length_field
        self.record_type_field: Optional[Field] = record_type_field

    @property
    def prefix_size(self) -> int:
        return sum(f.size for f in
                   (self.record_length_field, self.record_type_field)
                   if f is not None)

    def select(self, record_type: Optional[str]):
        if self.record_type_field is None:
            return self.records[0]
        return next((r for r in self.records if r.selector == record_type),
                    None)

    @classmethod
    def from_json(cls, raw: Union[bytes, str]) -> "Layout":
        data = json.loads(raw)

        def field(d) -> Field:
            return Field(d["name"], d["size"], d.get("type", "string"),
                         d.get("scale", 0))

        records = [RecordLayout([field(f) for f in r["fields"]],
                                r.get("name", "record"),
                                r.get("selector"))
                   for r in data["records"]]
        return cls(
            records,
            description=data.get("description", ""),
            header_size=data.get("header_size", 0),
            footer_size=data.get("footer_size", 0),
            record_length_field=(field(data["record_length_field"])
                                 if data.get("record_length_field")
                                 else None),
            record_type_field=(field(data["record_type_field"])
                               if data.get("record_type_field")
                               else None))


class FieldDecoder:
    def __init__(self, encoding: str = "cp037",
                 strip_control_characters: bool = True):
        self._decode_text = codecs.getdecoder(encoding)
        self._strip = strip_control_characters

    def decode(self, data: bytes, field: Field):
        try:
            if field.type == "string":
                value: Union[str, int] = self._string(data)
            elif field.type == "integer":
                value = int.from_bytes(data, "big", signed=True)
            elif field.type == "unsigned_integer":
                value = int.from_bytes(data, "big", signed=False)
            elif field.type == "packed_decimal":
                value = self._packed(data)
            elif field.type == "zoned_decimal":
                value = self._zoned(data)
            else:
                raise ValueError(f"unknown field type {field.type!r}")
        except (ArithmeticError, LookupError, UnicodeError,
                ValueError) as exc:
            raise EbcdicDecodeError(
                f"Cannot decode field {field.name!r} of type {field.type} "
                f"from {data.hex()!r}.") from exc
        if isinstance(value, int) and field.scale:
            return Decimal(value).scaleb(-field.scale)
        return value

    def _string(self, data: bytes) -> str:
        text, _ = self._decode_text(data)
        if self._strip:
            text = _CONTROL_CHARACTERS.sub("", text)
        return text.strip()

    @staticmethod
    def _packed(data: bytes) -> int:
        nibbles = data.hex()
        digits = int(nibbles[:-1] or "0")
        return -digits if int(nibbles[-1], 16) in _NEGATIVE_SIGNS \
            else digits

    @staticmethod
    def _zoned(data: bytes) -> int:
        low = [b & 0x0F for b in data]
        if any(n > 9 for n in low):
            raise ValueError(f"{data.hex()} holds a non-decimal digit")
        digits = int("".join(str(n) for n in low))
        return -digits if data[-1] >> 4 in _NEGATIVE_SIGNS else digits


def _parse_records(layout: Layout, decoder: FieldDecoder, data: bytes,
                   max_records: Optional[int]) -> dict[str, list[list]]:
    rows: dict[str, list[list]] = {r.name: [] for r in layout.records}
    end = len(data) - layout.footer_size
    offset = layout.header_size
    count = 0
    while offset < end and (max_records is None or count < max_records):
        length = record_type = None
        if layout.record_length_field is not None:
            f = layout.record_length_field
            length = int(decoder.decode(_take(data, offset, f.size, end,
                                              f.name), f))
            offset += f.size
        if layout.record_type_field is not None:
            f = layout.record_type_field
            record_type = str(decoder.decode(_take(data, offset, f.size,
                                                   end, f.name), f))
            offset += f.size
        record = layout.select(record_type)
        if record is None:
            raise EbcdicDecodeError(
                f"No record layout matches record type {record_type!r}.")
        size = record.size if length is None \
            else length - layout.prefix_size
        if size < 0:
            raise EbcdicDecodeError(
                f"Record length {length} is shorter than the "
                f"{layout.prefix_size}-byte record prefix.")
        if size == 0 and layout.prefix_size == 0:
            # No length prefix advanced the offset and the record body is
            # empty: the loop would spin forever appending empty rows.
            raise EbcdicDecodeError(
                f"Record {record.name!r} has zero effective size and no "
                "length prefix; parsing cannot advance.")
        body = _take(data, offset, size, end, record.name)
        values = []
        field_offset = 0
        for field in record.fields:
            chunk = body[field_offset:field_offset + field.size]
            field_offset += field.size
            if field.type != "skip":
                values.append(str(decoder.decode(chunk, field)))
        rows[record.name].append(values)
        offset += size
        count += 1
    return rows


def _take(data: bytes, offset: int, size: int, end: int,
          name: str) -> bytes:
    if offset + size > end:
        raise EbcdicDecodeError(
            f"Input ends inside {name!r}: {end - offset} of {size} "
            "bytes left.")
    return data[offset:offset + size]


def _build_table(record: RecordLayout, rows: list[list]) -> TableData:
    header = [f.name for f in record.fields if f.type != "skip"]
    table = TableData(num_rows=len(rows) + 1, num_cols=len(header))
    for row_idx, row in enumerate([header, *rows]):
        for col_idx, value in enumerate(row):
            table.table_cells.append(TableCell(
                text=value, row_span=1, col_span=1,
                start_row_offset_idx=row_idx,
                end_row_offset_idx=row_idx + 1,
                start_col_offset_idx=col_idx,
                end_col_offset_idx=col_idx + 1,
                column_header=row_idx == 0))
    return table


def convert_ebcdic(data: bytes, layout: Union[Layout, bytes, str],
                   name: str = "file", filename: str = "",
                   binary_hash: int = 0, encoding: str = "cp037",
                   strip_control_characters: bool = True,
                   max_records: Optional[int] = None) -> Doc:
    """EBCDIC bytes + layout -> Doc (reference semantics, see module
    docstring)."""
    if not isinstance(layout, Layout):
        layout = Layout.from_json(layout)
    doc = Doc(name, filename=filename or f"{name}.ebc",
              binary_hash=binary_hash, mimetype=EBCDIC_MIMETYPE)
    if layout.description:
        doc.add_text(label="text", text=layout.description)
    decoder = FieldDecoder(encoding, strip_control_characters)
    rows = _parse_records(layout, decoder, data, max_records)
    for record in layout.records:
        if not rows[record.name]:
            continue
        if len(layout.records) > 1:
            doc.add_heading(text=record.name)
        doc.add_table(data=_build_table(record, rows[record.name]))
    return doc
