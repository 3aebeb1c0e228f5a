#!/usr/bin/env python
"""PDF corpus sweep: convert every reference PDF fixture and byte-compare
markdown (and optionally itxt) against the reference groundtruth exports.

Usage:
  python tools/pdf_diff.py              # summary over all fixtures
  python tools/pdf_diff.py NAME md      # unified diff for one fixture
  python tools/pdf_diff.py NAME itxt

Reference groundtruth: /root/reference/tests/data/pdf/groundtruth
(exports produced by the reference's StandardPdfPipeline with do_ocr=False).
"""

from __future__ import annotations

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.pdfdoc import convert_pdf  # noqa: E402
from docling_spark.serialize import to_markdown  # noqa: E402

try:
    from docling_spark.serialize import to_doctags
except ImportError:  # exporter not built yet
    def to_doctags(doc):
        return ""

SRC = pathlib.Path("/root/reference/tests/data/pdf/sources")
GT = pathlib.Path("/root/reference/tests/data/pdf/groundtruth")


def run_one(stem: str):
    raw = (SRC / f"{stem}.pdf").read_bytes()
    doc = convert_pdf(raw, name=stem, filename=f"{stem}.pdf")
    return to_markdown(doc), to_doctags(doc)


def main():
    names = sorted(p.stem for p in SRC.glob("*.pdf")
                   if (GT / f"{p.stem}.md").exists())
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        md, dt = run_one(stem)
        mine = md if kind == "md" else dt
        ext = "md" if kind == "md" else "doctags.txt"
        gt = (GT / f"{stem}.{ext}").read_text()
        import difflib
        for line in difflib.unified_diff(
                gt.splitlines(True), mine.splitlines(True),
                "groundtruth", "ours"):
            sys.stdout.write(line)
        return
    ok_md = ok_itxt = err = 0
    for stem in names:
        try:
            md, dt = run_one(stem)
            gmd = (GT / f"{stem}.md")
            gdt = (GT / f"{stem}.doctags.txt")
            m = gmd.exists() and gmd.read_text() == md
            i = gdt.exists() and gdt.read_text() == dt
            ok_md += m
            ok_itxt += i
            ndiff = ""
            if not m and gmd.exists():
                import difflib
                d = sum(1 for ln in difflib.unified_diff(
                    gmd.read_text().splitlines(), md.splitlines())
                    if ln[:1] in "+-")
                ndiff = f" ({d} diff lines)"
            print(f"{stem:42s} md={'OK ' if m else 'DIFF'} "
                  f"doctags={'OK ' if i else 'DIFF'}{ndiff}")
        except Exception as exc:
            err += 1
            print(f"{stem:42s} ERROR {type(exc).__name__}: {exc}")
            traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{len(names)}  doctags {ok_itxt}/{len(names)}  "
          f"errors {err}")


if __name__ == "__main__":
    main()
