"""Hardened XML parsing for untrusted crawl payloads (round-4 ADVICE:
entity-expansion DoS — billion-laughs / quadratic blowup — must be
rejected before ElementTree expands anything)."""

import pytest

from docling_spark import xmlsafe

BOMB = (b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "xx">'
        b'<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;">]><lolz>&b;</lolz>')


def test_plain_xml_parses():
    root = xmlsafe.fromstring("<a x='1'><b>t</b></a>")
    assert root.tag == "a" and root[0].text == "t"


def test_bytes_and_bom():
    assert xmlsafe.fromstring(b"\xef\xbb\xbf<a/>").tag == "a"


def test_doctype_rejected_str_and_bytes():
    with pytest.raises(xmlsafe.DTDForbidden):
        xmlsafe.fromstring(BOMB)
    with pytest.raises(xmlsafe.DTDForbidden):
        xmlsafe.fromstring(BOMB.decode("ascii"))


def test_doctype_after_comments_and_pis_rejected():
    doc = ("<?xml version='1.0'?><!-- c1 --><?pi data?>\n<!-- c2 -->"
           "<!DOCTYPE r [<!ENTITY e 'x'>]><r>&e;</r>")
    with pytest.raises(xmlsafe.DTDForbidden):
        xmlsafe.fromstring(doc)


def test_doctype_behind_megabyte_comment_rejected():
    doc = "<!-- " + "x" * 1_000_000 + " --><!DOCTYPE r []><r/>"
    with pytest.raises(xmlsafe.DTDForbidden):
        xmlsafe.fromstring(doc)


def test_utf16_bomb_rejected():
    with pytest.raises(xmlsafe.DTDForbidden):
        xmlsafe.fromstring(BOMB.decode("ascii").encode("utf-16"))


def test_dtdforbidden_is_a_parse_error():
    # callers using `except ET.ParseError: continue` stay correct
    from xml.etree import ElementTree as ET
    assert issubclass(xmlsafe.DTDForbidden, ET.ParseError)


def test_xbrl_instance_with_dtd_rejected():
    from docling_spark.xbrl import convert_xbrl
    with pytest.raises(xmlsafe.DTDForbidden):
        convert_xbrl(BOMB)


def test_bomless_utf16_bomb_rejected():
    """Round-5 ADVICE: expat auto-detects BOM-less UTF-16 from the
    null-interleaved '<?' prolog, so the DOCTYPE guard must re-scan
    after decoding — without it the bomb parses and expands."""
    payload = BOMB.decode("ascii")
    for enc in ("utf-16-le", "utf-16-be"):
        with pytest.raises(xmlsafe.DTDForbidden):
            xmlsafe.fromstring(payload.encode(enc))


def test_bomless_utf16_plain_xml_still_parses():
    # expat accepts BOM-less UTF-16 with an XML declaration; the guard
    # must not reject clean documents
    doc = "<?xml version='1.0'?><a><b>t</b></a>"
    for enc in ("utf-16-le", "utf-16-be"):
        root = xmlsafe.fromstring(doc.encode(enc))
        assert root.tag == "a" and root[0].text == "t"
