"""Legacy binary .doc reader — all three exports byte-identical vs the
reference groundtruth (the reference converts via LibreOffice + its
docx backend: legacy_msoffice_backend.py; ours parses [MS-DOC] and
synthesizes the equivalent docx for the shared msword backend)."""

import hashlib
import json
import pathlib

import pytest

SRC = pathlib.Path("/root/reference/tests/data/doc/sources")
GT = pathlib.Path("/root/reference/tests/data/doc/groundtruth")


@pytest.fixture(scope="module")
def converted():
    from docling_spark.worddoc import convert_doc
    raw = (SRC / "legacy_sample.doc").read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    return convert_doc(raw, name="legacy_sample",
                       filename="legacy_sample.doc", binary_hash=bh)


def test_md_byte_identical(converted):
    from docling_spark.serialize import to_markdown
    assert to_markdown(converted) == \
        (GT / "legacy_sample.doc.md").read_text()


def test_itxt_byte_identical(converted):
    from docling_spark.serialize import to_indented_text
    assert to_indented_text(converted) == \
        (GT / "legacy_sample.doc.itxt").read_text()


def test_json_byte_identical(converted):
    from docling_spark.serialize import to_json
    assert json.loads(to_json(converted)) == \
        json.load(open(GT / "legacy_sample.doc.json"))


def test_structures():
    from docling_spark.worddoc import DocFile
    d = DocFile((SRC / "legacy_sample.doc").read_bytes())
    assert d.ccp_text == 728
    assert d.style_names[1] == "Heading 1"
    assert d.style_names[17] == "Title"
    assert d.lfo_fmt[19] == "bullet" and d.lfo_fmt[17] == "decimal"
    # the inline duck picture is a real PNG in the Data stream
    ext, img = d.picture(0)
    assert ext == "png" and img[:4] == b"\x89PNG"


def test_not_a_doc_raises():
    from docling_spark.worddoc import DocError, DocFile
    with pytest.raises((DocError, ValueError)):
        DocFile(b"\xd0\xcf\x11\xe0" + b"\x00" * 600)


def test_engine_dispatch(spark):
    from docling_spark import engine
    raw = (SRC / "legacy_sample.doc").read_bytes()
    df = spark.createDataFrame(
        [("https://x/legacy_sample.doc", raw)], "url string, html binary")
    row = engine.extract_pages(df, repartition=False).collect()[0]
    assert row["status"] == "success"
    assert row["n_tables"] == 1 and row["n_pictures"] == 1
