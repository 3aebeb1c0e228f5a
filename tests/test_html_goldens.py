"""Golden-file e2e: byte-identical md/itxt vs the reference groundtruth.

Mirrors the reference's own test strategy
(``tests/test_backend_html.py:443-471`` driving
``tests/data/html/groundtruth``; SURVEY.md §5).
"""

import pathlib

import pytest

from docling_spark.extractor import extract
from docling_spark.serialize import to_indented_text, to_json, to_markdown

SRC = pathlib.Path("/root/reference/tests/data/html/sources")
GT = pathlib.Path("/root/reference/tests/data/html/groundtruth")

KNOWN_GAPS: set = set()

FIXTURES = sorted(p.stem for p in SRC.glob("*.html")) if SRC.exists() else []


@pytest.mark.parametrize("name", [n for n in FIXTURES if n not in KNOWN_GAPS])
def test_markdown_byte_identical(name):
    doc = extract((SRC / f"{name}.html").read_bytes(), name=name,
                  filename=f"{name}.html")
    golden = (GT / f"{name}.html.md").read_text()
    assert to_markdown(doc) == golden


@pytest.mark.parametrize(
    "name",
    [n for n in FIXTURES
     if n not in KNOWN_GAPS and (GT / f"{n}.html.itxt").exists()])
def test_itxt_byte_identical(name):
    doc = extract((SRC / f"{name}.html").read_bytes(), name=name,
                  filename=f"{name}.html")
    golden = (GT / f"{name}.html.itxt").read_text()
    assert to_indented_text(doc) == golden


@pytest.mark.parametrize("name", [n for n in FIXTURES if n not in KNOWN_GAPS])
def test_json_structure(name):
    """Structural checks on the JSON export (full structural equality vs
    goldens is tracked separately; refs must at least resolve)."""
    import json
    doc = extract((SRC / f"{name}.html").read_bytes(), name=name)
    d = json.loads(to_json(doc))
    assert d["schema_name"] == "DoclingDocument"
    for arr in ("texts", "groups", "tables", "pictures"):
        for item in d[arr]:
            ref = item["self_ref"]
            kind, idx = ref.rsplit("/", 2)[-2:]
            assert d[kind][int(idx)]["self_ref"] == ref


def test_extractor_never_raises_on_garbage():
    for raw in (b"", b"<p>a<p>b", b"\xff\xfe\x00bad", b"<table><td>x",
                b"<ul><li>a<li>b</ul>", b"<div>" * 300 + b"</div>" * 100):
        doc = extract(raw, name="garbage")
        to_markdown(doc)
        to_indented_text(doc)
        to_json(doc)
