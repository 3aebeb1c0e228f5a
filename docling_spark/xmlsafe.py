"""Hardened ElementTree parsing for untrusted (crawl) XML payloads.

``xml.etree.ElementTree`` never fetches external entities, but it DOES
expand entities declared in an internal DTD subset, which leaves
``fromstring`` open to entity-expansion DoS (billion-laughs / quadratic
blowup) on crawl content. This module exposes a ``fromstring`` that
rejects any document carrying a DOCTYPE declaration — the same policy
defusedxml applies (``forbid_dtd``), done here with an exact lexical
prolog scan because the C-accelerated stdlib XMLParser exposes no expat
hooks. The scan is sound: XML only permits ``<!DOCTYPE`` in the prolog
(before the root element), so skipping the XML declaration, processing
instructions, comments, and whitespace reaches either a DOCTYPE (reject)
or the root element (no DTD can follow; expat itself errors on a
misplaced one). Without a DTD there are no entity declarations, hence no
expansion blowup.

Reference parity note: the reference delegates XBRL to Arelle and METS
to lxml, both of which harden or limit DTD processing; our stdlib
backends (xbrl.py, metsgbs.py) route crawl XML through this module.
"""
from __future__ import annotations

from xml.etree import ElementTree as ET

__all__ = ["fromstring", "DTDForbidden"]


class DTDForbidden(ET.ParseError):
    """Raised when untrusted XML carries a DOCTYPE declaration."""


def _has_doctype(text) -> bool:
    """Exact prolog scan: True iff a DOCTYPE declaration precedes the
    root element. Anything unexpected is left for the real parser.
    Works on str or bytes; full-length scan (comments/PIs are skipped by
    ``find`` so this stays O(prolog))."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text)
        if text[:2] in (b"\xff\xfe", b"\xfe\xff"):   # UTF-16 payloads
            return _has_doctype(text.decode("utf-16", "replace"))
        # expat also auto-detects BOM-less UTF-16 from a null-interleaved
        # prolog ("<\x00?\x00" / "\x00<\x00?"); without this re-scan a
        # UTF-16 DOCTYPE would slip past the byte-level matcher below
        if text[:4:2] == b"<?" and text[1:4:2] == b"\x00\x00":
            return _has_doctype(text.decode("utf-16-le", "replace"))
        if text[:4:2] == b"\x00\x00" and text[1:4:2] == b"<?":
            return _has_doctype(text.decode("utf-16-be", "replace"))
        ws, lt, pi, pi_end = b" \t\r\n", b"<", b"<?", b"?>"
        cm, cm_end, dt = b"<!--", b"-->", b"<!DOCTYPE"
        bom = b"\xef\xbb\xbf"
    else:
        ws, lt, pi, pi_end = " \t\r\n", "<", "<?", "?>"
        cm, cm_end, dt = "<!--", "-->", "<!DOCTYPE"
        bom = "﻿"
    i, n = 0, len(text)
    if text.startswith(bom):
        i = len(bom)
    while i < n:
        c = text[i:i + 1]
        if c in ws:
            i += 1
            continue
        if c != lt:
            return False  # malformed prolog; let ET raise its own error
        if text.startswith(pi, i):              # XML decl / PI
            j = text.find(pi_end, i + 2)
            if j < 0:
                return False
            i = j + 2
        elif text.startswith(cm, i):            # comment
            j = text.find(cm_end, i + 4)
            if j < 0:
                return False
            i = j + 3
        elif text.startswith(dt, i):
            return True
        else:                                    # root element (or garbage)
            return False
    return False


def fromstring(text) -> ET.Element:
    """``ET.fromstring`` that raises :class:`DTDForbidden` when the
    document declares a DTD (accepts ``str`` or ``bytes``)."""
    if _has_doctype(text):
        raise DTDForbidden(
            "DOCTYPE declaration forbidden in untrusted XML")
    return ET.fromstring(text)
