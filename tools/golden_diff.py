#!/usr/bin/env python
"""Fixture diff loop: run the extractor over every reference HTML source and
compare md/itxt output against the groundtruth exports.

Usage:
  python tools/golden_diff.py            # summary table
  python tools/golden_diff.py NAME       # unified diff for one fixture (md)
  python tools/golden_diff.py NAME itxt  # unified diff for one fixture (itxt)
"""

from __future__ import annotations

import difflib
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import hashlib
import json as _json

from docling_spark.extractor import extract
from docling_spark.serialize import to_indented_text, to_json, to_markdown

SRC = pathlib.Path("/root/reference/tests/data/html/sources")
GT = pathlib.Path("/root/reference/tests/data/html/groundtruth")


def run_one(name: str):
    raw = (SRC / f"{name}.html").read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    doc = extract(raw, name=name, filename=f"{name}.html", binary_hash=bh)
    return doc


def pretty_json(doc) -> str:
    return _json.dumps(_json.loads(to_json(doc)), indent=2,
                       ensure_ascii=False)


def compare(name: str) -> dict:
    out = {"md": None, "itxt": None, "json": None, "error": None}
    try:
        doc = run_one(name)
        md = to_markdown(doc)
        itxt = to_indented_text(doc)
        js = pretty_json(doc)
    except Exception:
        out["error"] = traceback.format_exc()
        return out
    if (GT / f"{name}.html.md").exists():
        out["md"] = md == (GT / f"{name}.html.md").read_text()
    if (GT / f"{name}.html.itxt").exists():
        out["itxt"] = itxt == (GT / f"{name}.html.itxt").read_text()
    if (GT / f"{name}.html.json").exists():
        out["json"] = js == (GT / f"{name}.html.json").read_text()
    return out


def main():
    names = sorted(p.stem for p in SRC.glob("*.html"))
    if len(sys.argv) > 1:
        name = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        doc = run_one(name)
        ours = (to_markdown(doc) if kind == "md"
                else to_indented_text(doc) if kind == "itxt"
                else pretty_json(doc))
        gt = (GT / f"{name}.html.{kind}").read_text()
        sys.stdout.writelines(difflib.unified_diff(
            gt.splitlines(keepends=True), ours.splitlines(keepends=True),
            "golden", "ours"))
        print()
        return
    md_pass = itxt_pass = json_pass = err = 0
    for name in names:
        r = compare(name)
        if r["error"]:
            err += 1
            first_line = r["error"].strip().splitlines()[-1]
            print(f"{name:45s} ERROR {first_line}")
            continue
        md_pass += r["md"] is True
        itxt_pass += r["itxt"] is True
        json_pass += r["json"] is True
        def fmt(v):
            return "OK " if v else "DIFF" if v is False else "-- "
        print(f"{name:45s} md={fmt(r['md'])} itxt={fmt(r['itxt'])} "
              f"json={fmt(r['json'])}")
    print(f"\nTOTAL: md {md_pass}/{len(names)}  itxt {itxt_pass}/{len(names)}  "
          f"json {json_pass}/{len(names)}  errors {err}")


if __name__ == "__main__":
    main()
