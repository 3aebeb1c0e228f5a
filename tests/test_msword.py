"""DOCX backend tests: golden byte-identity sweep + semantic units.

Goldens live in /root/reference/tests/data/docx/{sources,groundtruth};
OMML equations / textboxes / drawingml are declared out of scope this
round (module docstring), so the sweep asserts a floor, not 32/32.
"""

import pathlib

import pytest

from docling_spark.msword import DocxPackage, convert_docx
from docling_spark.serialize import to_indented_text, to_markdown

SRC = pathlib.Path("/root/reference/tests/data/docx/sources")
GT = pathlib.Path("/root/reference/tests/data/docx/groundtruth")

# fixtures whose md is expected byte-identical (everything except the
# OMML/textbox/drawingml subsystems scoped out this round)
OUT_OF_SCOPE = {
    "equations", "omml_frac_superscript", "omml_func_log",
    "omml_multi_equation_paragraph", "omml_text_escapes_in_math",
    "table_with_equations", "textbox", "drawingml",
}


def _names():
    return sorted(p.stem for p in SRC.glob("*.docx"))


@pytest.mark.parametrize("stem", [n for n in _names()
                                  if n not in OUT_OF_SCOPE])
def test_docx_md_golden_byte_identical(stem):
    raw = (SRC / f"{stem}.docx").read_bytes()
    doc = convert_docx(raw, name=stem, filename=f"{stem}.docx")
    golden = (GT / f"{stem}.docx.md")
    assert golden.exists()
    assert to_markdown(doc) == golden.read_text()


@pytest.mark.parametrize("stem", [n for n in _names()
                                  if n not in OUT_OF_SCOPE])
def test_docx_itxt_golden_byte_identical(stem):
    raw = (SRC / f"{stem}.docx").read_bytes()
    doc = convert_docx(raw, name=stem, filename=f"{stem}.docx")
    golden = (GT / f"{stem}.docx.itxt")
    assert golden.exists()
    assert to_indented_text(doc) == golden.read_text()


def test_strict_package_normalized():
    raw = (SRC / "Strict.docx").read_bytes()
    pkg = DocxPackage(raw)
    assert pkg._strict is True
    assert pkg.document is not None  # parsed under transitional namespaces


def test_never_raises_on_garbage():
    with pytest.raises(Exception):
        convert_docx(b"not a zip at all")  # caller (engine) wraps this


def test_engine_dispatches_docx(spark):
    raw = (SRC / "lorem_ipsum.docx").read_bytes()
    from docling_spark import engine
    pages = spark.createDataFrame(
        [("https://x/lorem_ipsum.docx", raw),
         ("https://x/broken.docx", b"junk")],
        "url string, html binary")
    rows = {r["url"]: r for r in
            engine.extract_pages(pages, repartition=False).collect()}
    ok = rows["https://x/lorem_ipsum.docx"]
    assert ok["status"] == "success"
    assert ok["n_texts"] > 0
    assert rows["https://x/broken.docx"]["status"] == "failure"
