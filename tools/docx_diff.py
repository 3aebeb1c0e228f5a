#!/usr/bin/env python
"""DOCX corpus sweep: convert every reference docx fixture and byte-compare
markdown (and optionally itxt) against the reference groundtruth.

Usage:
  python tools/docx_diff.py              # summary over all fixtures
  python tools/docx_diff.py NAME md      # unified diff for one fixture
"""

from __future__ import annotations

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.msword import convert_docx  # noqa: E402
from docling_spark.serialize import (  # noqa: E402
    to_indented_text, to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/docx/sources")
GT = pathlib.Path("/root/reference/tests/data/docx/groundtruth")


def run_one(stem: str):
    raw = (SRC / f"{stem}.docx").read_bytes()
    doc = convert_docx(raw, name=stem, filename=f"{stem}.docx")
    return to_markdown(doc), to_indented_text(doc)


def main():
    names = sorted(p.stem for p in SRC.glob("*.docx"))
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        md, itxt = run_one(stem)
        mine = md if kind == "md" else itxt
        gt = (GT / f"{stem}.docx.{kind}").read_text()
        import difflib
        for line in difflib.unified_diff(
                gt.splitlines(True), mine.splitlines(True),
                "groundtruth", "ours"):
            sys.stdout.write(line)
        return
    ok_md = ok_itxt = err = 0
    for stem in names:
        try:
            md, itxt = run_one(stem)
            gmd = (GT / f"{stem}.docx.md")
            gitxt = (GT / f"{stem}.docx.itxt")
            m = gmd.exists() and gmd.read_text() == md
            i = gitxt.exists() and gitxt.read_text() == itxt
            ok_md += m
            ok_itxt += i
            print(f"{stem:42s} md={'OK ' if m else 'DIFF'} "
                  f"itxt={'OK ' if i else 'DIFF'}")
        except Exception as exc:
            err += 1
            print(f"{stem:42s} ERROR {type(exc).__name__}: {exc}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{len(names)}  itxt {ok_itxt}/{len(names)}"
          f"  errors {err}")


if __name__ == "__main__":
    main()
