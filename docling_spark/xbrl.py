"""XBRL instance -> Doc: facts, text blocks, and a key-value fact graph.

From-scratch reimplementation of the reference's Arelle-backed XBRL backend
(``docling/backend/xml/xbrl_backend.py``) using only stdlib ElementTree:

- document title from DocumentType / EntityRegistrantName /
  DocumentPeriodEndDate facts (``xbrl_backend.py:262-276``);
- textBlockItemType facts re-parsed as HTML and concatenated into the doc
  (``:283-314``);
- numeric facts -> GraphData key/value cells with period/currency/decimals
  values (``:316-381``), periods following Arelle's end-instant convention
  (an instant or period end date surfaces as date + 1 day);
- presentation-linkbase parent-child hierarchy climbed from each reported
  concept, calculation-linkbase summation arcs with weights
  (``:383-459``).

The taxonomy rides as an in-memory ``{path: bytes}`` mapping (zip members
expanded) - the blob-friendly analog of the reference's taxonomy-package
directory option, broadcastable to Spark workers.
"""

from __future__ import annotations

import datetime
import io
import re
import zipfile
from xml.etree import ElementTree as ET

from . import xmlsafe

from .model import Doc

__all__ = ["convert_xbrl", "looks_like_xbrl", "flatten_taxonomy"]

XBRLI = "http://www.xbrl.org/2003/instance"
LINK = "http://www.xbrl.org/2003/linkbase"
XLINK = "http://www.w3.org/1999/xlink"
XS = "http://www.w3.org/2001/XMLSchema"

_SKIP_NS = (XBRLI, LINK)


def looks_like_xbrl(raw: bytes) -> bool:
    head = raw[:4096]
    return b"http://www.xbrl.org/2003/instance" in head and (
        b"<xbrl" in head or b":xbrl" in head)


def flatten_taxonomy(files: dict) -> dict:
    """Expand any zip members of a {path: bytes} mapping in place-ish."""
    out = {}
    for path, data in files.items():
        if path.lower().endswith(".zip"):
            try:
                zf = zipfile.ZipFile(io.BytesIO(data))
            except zipfile.BadZipFile:
                continue
            for name in zf.namelist():
                if not name.endswith("/"):
                    out[name] = zf.read(name)
        else:
            out[path] = data
    return out


def _parse_date(text: str) -> datetime.date | None:
    text = (text or "").strip()
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})", text)
    if not m:
        return None
    try:
        return datetime.date(int(m.group(1)), int(m.group(2)),
                             int(m.group(3)))
    except ValueError:
        return None


def _plus_day(d: datetime.date) -> datetime.date:
    return d + datetime.timedelta(days=1)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _ns(tag: str) -> str:
    return tag[1:].split("}", 1)[0] if tag.startswith("{") else ""


def _contexts_and_units(root) -> tuple[dict, dict]:
    contexts: dict[str, str] = {}
    units: dict[str, str] = {}
    for el in root:
        if el.tag == f"{{{XBRLI}}}context":
            cid = el.get("id", "")
            period_text = ""
            period = el.find(f"{{{XBRLI}}}period")
            if period is not None:
                instant = period.find(f"{{{XBRLI}}}instant")
                start = period.find(f"{{{XBRLI}}}startDate")
                end = period.find(f"{{{XBRLI}}}endDate")
                if instant is not None:
                    d = _parse_date(instant.text or "")
                    if d:
                        # Arelle end-instant convention: midnight of the
                        # NEXT day, so .date() is date + 1
                        period_text = str(_plus_day(d))
                elif start is not None and end is not None:
                    ds = _parse_date(start.text or "")
                    de = _parse_date(end.text or "")
                    if ds and de:
                        period_text = f"{ds} - {_plus_day(de)}"
            contexts[cid] = period_text
        elif el.tag == f"{{{XBRLI}}}unit":
            uid = el.get("id", "")
            measure = None
            div = el.find(f"{{{XBRLI}}}divide")
            if div is not None:
                num = div.find(f"{{{XBRLI}}}unitNumerator")
                if num is not None:
                    measure = num.find(f"{{{XBRLI}}}measure")
            else:
                measure = el.find(f"{{{XBRLI}}}measure")
            text = (measure.text or "") if measure is not None else ""
            units[uid] = text.split(":")[-1].strip()
    return contexts, units


def _schema_types(taxonomy: dict) -> dict:
    """(namespace, element name) -> type local name, from every xsd."""
    types: dict[tuple, str] = {}
    for path, data in taxonomy.items():
        if not path.lower().endswith(".xsd"):
            continue
        try:
            root = xmlsafe.fromstring(data)
        except ET.ParseError:
            continue
        tns = root.get("targetNamespace", "")
        for el in root.iter(f"{{{XS}}}element"):
            nm = el.get("name")
            ty = el.get("type", "")
            if nm:
                types[(tns, nm)] = ty.split(":")[-1]
    return types


def _prefix_map(raw: bytes) -> dict:
    """namespace uri -> prefix, from the instance's own declarations."""
    out = {}
    try:
        for event, (prefix, uri) in ET.iterparse(
                io.BytesIO(raw), events=("start-ns",)):
            if uri not in out:
                out[uri] = prefix
    except ET.ParseError:
        pass
    return out


def _parse_linkbase_arcs(taxonomy: dict, arc_local: str) -> list[tuple]:
    """All (from_concept, to_concept, arc_element) triples, in document
    order across linkbase files (concepts as 'prefix:Local' derived from
    the loc href fragment 'prefix_Local')."""
    arcs = []
    for path in sorted(taxonomy):
        if not path.lower().endswith((".xml", ".xsd")):
            continue
        data = taxonomy[path]
        if arc_local.encode() not in data:
            continue
        try:
            root = xmlsafe.fromstring(data)
        except ET.ParseError:
            continue
        for linkel in root.iter():
            if _local(linkel.tag) not in ("presentationLink",
                                          "calculationLink"):
                continue
            locs = {}
            for child in linkel:
                if _local(child.tag) == "loc":
                    label = child.get(f"{{{XLINK}}}label", "")
                    href = child.get(f"{{{XLINK}}}href", "")
                    frag = href.split("#")[-1]
                    if "_" in frag:
                        pref, local = frag.split("_", 1)
                        locs[label] = f"{pref}:{local}"
            for child in linkel:
                if _local(child.tag) == arc_local:
                    f = locs.get(child.get(f"{{{XLINK}}}from", ""))
                    t = locs.get(child.get(f"{{{XLINK}}}to", ""))
                    if f and t:
                        arcs.append((f, t, child))
    return arcs


class _Graph:
    """GraphData builder mirroring the reference's cell/link protocol."""

    def __init__(self):
        self.cells: list[dict] = []
        self.links: list[dict] = []
        self.idx = 0
        self.hierarchy_ids: dict[str, int] = {}
        self.fact_ids: dict[str, list[int]] = {}
        self.created_links: set = set()

    def add_cell(self, label: str, text: str, orig: str) -> int:
        cid = self.idx
        self.cells.append({"label": label, "cell_id": cid,
                           "text": text, "orig": orig})
        self.idx += 1
        return cid

    def hierarchy_cell(self, qname: str) -> int:
        if qname not in self.hierarchy_ids:
            self.hierarchy_ids[qname] = self.add_cell(
                "key", qname.split(":")[-1], qname)
        return self.hierarchy_ids[qname]

    def add_link(self, label: str, src: int, tgt: int) -> None:
        if (src, tgt) not in self.created_links:
            self.created_links.add((src, tgt))
            self.links.append({"label": label, "source_cell_id": src,
                               "target_cell_id": tgt})


def convert_xbrl(raw: bytes, taxonomy: dict | None = None,
                 name: str = "file", filename: str = "",
                 binary_hash: int = 0) -> Doc:
    """XBRL instance bytes + in-memory taxonomy -> Doc."""
    from .extractor import HtmlExtractor

    taxonomy = flatten_taxonomy(taxonomy or {})
    root = xmlsafe.fromstring(raw)
    if _local(root.tag) != "xbrl":
        raise ValueError("not an XBRL instance document")
    contexts, units = _contexts_and_units(root)
    types = _schema_types(taxonomy)
    prefixes = _prefix_map(raw)

    facts = [el for el in root
             if _ns(el.tag) not in _SKIP_NS and _local(el.tag)]

    # metadata title (last non-empty value wins, per the reference loop)
    doc_type = doc_org = doc_period = ""
    for el in facts:
        local = _local(el.tag)
        value = "".join(el.itertext())
        if local == "DocumentType" and value:
            doc_type = value
        elif local == "EntityRegistrantName" and value:
            doc_org = value
        elif local == "DocumentPeriodEndDate" and value:
            doc_period = value
    title = f"{doc_type} {doc_org} {doc_period}".strip()
    doc = Doc(name, filename=filename or f"{name}.xml",
              binary_hash=binary_hash, mimetype="application/xml")
    doc.add_title(text=title if title else (filename or f"{name}.xml"))

    graph = _Graph()
    html = HtmlExtractor(add_title=False, infer_furniture=False)

    for el in facts:
        ns = _ns(el.tag)
        local = _local(el.tag)
        prefix = prefixes.get(ns, "")
        qname = f"{prefix}:{local}" if prefix else local
        value = "".join(el.itertext())
        type_local = types.get((ns, local), "")

        if type_local == "textBlockItemType" and value:
            content = re.sub(r"\s+", " ", value).strip()
            sub = html.convert(content.encode("utf-8"),
                               name="text_block",
                               filename="text_block.html")
            doc.extend_from(sub)

        unit_ref = el.get("unitRef")
        if unit_ref is not None and local and value:
            ctx_ref = el.get("contextRef", "")
            period_text = contexts.get(ctx_ref, "")
            unit_text = units.get(unit_ref, "")
            decimals = el.get("decimals")
            decimals_text = decimals if decimals is not None else ""
            key_id = graph.add_cell("key", local, qname)
            graph.fact_ids.setdefault(qname, []).append(key_id)
            for text, orig in (
                    (f"value: {value}" if value else "", "value"),
                    (f"period: {period_text}" if period_text else "",
                     "period"),
                    (f"currency: {unit_text}" if unit_text else "", "unit"),
                    (f"decimals: {decimals_text}" if decimals_text else "",
                     "decimals")):
            # NOTE: empty strings still create cells, matching the
            # reference's unconditional append
                vid = graph.add_cell("value", str(text), str(orig))
                graph.links.append({"label": "to_value",
                                    "source_cell_id": key_id,
                                    "target_cell_id": vid})

    # 1) presentation hierarchy, climbed from each reported concept
    pre_arcs = _parse_linkbase_arcs(taxonomy, "presentationArc")
    parents: dict[str, list[str]] = {}
    for f, t, _arc in pre_arcs:
        parents.setdefault(t, []).append(f)
    visited: set[str] = set()
    for el in facts:
        ns = _ns(el.tag)
        local = _local(el.tag)
        prefix = prefixes.get(ns, "")
        qname = f"{prefix}:{local}" if prefix else local
        value = "".join(el.itertext())
        if el.get("unitRef") is None or not local or not value \
                or qname in visited:
            continue
        visited.add(qname)
        if qname in graph.fact_ids:
            concept_id = graph.hierarchy_cell(qname)
            for fact_cell in graph.fact_ids[qname]:
                if fact_cell != concept_id:
                    graph.add_link("to_child", concept_id, fact_cell)
        current = qname
        while True:
            ps = parents.get(current)
            if not ps:
                break
            parent = ps[0]
            child_id = graph.hierarchy_cell(current)
            parent_id = graph.hierarchy_cell(parent)
            graph.add_link("to_child", parent_id, child_id)
            if parent in visited:
                break
            visited.add(parent)
            current = parent

    # 2) calculation arcs with weights
    for f, t, arc in _parse_linkbase_arcs(taxonomy, "calculationArc"):
        parent_id = graph.hierarchy_cell(f)
        child_id = graph.hierarchy_cell(t)
        graph.add_link("to_child", parent_id, child_id)
        try:
            weight = float(arc.get("weight", "1"))
        except ValueError:
            weight = 1.0
        wid = graph.add_cell("value", f"weight: {weight}", "weight")
        graph.add_link("to_value", child_id, wid)

    if graph.cells and graph.links:
        doc.add_key_values({"cells": graph.cells, "links": graph.links})
    return doc
