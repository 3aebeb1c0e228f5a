#!/usr/bin/env python
"""XLSX corpus sweep: convert every reference xlsx/xlsm fixture and
byte-compare markdown, itxt, and json against the reference groundtruth.

JSON comparison masks each picture's ``image.uri`` (the reference embeds a
PIL-re-encoded PNG; we carry the original bytes) and, for pictures the
reference rasterized externally (EMF/WMF via LibreOffice), the whole
``image`` object.

Usage:
  python tools/xlsx_diff.py              # summary over all fixtures
  python tools/xlsx_diff.py NAME md      # unified diff for one fixture
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.msexcel import convert_xlsx  # noqa: E402
from docling_spark.serialize import (  # noqa: E402
    to_indented_text, to_json, to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/xlsx/sources")
GT = pathlib.Path("/root/reference/tests/data/xlsx/groundtruth")

# the xlsx_comments groundtruth md was generated with ALL content layers
# (reference tests/test_backend_msexcel.py:194-201)
_ALL_LAYER_STEMS = {"xlsx_comments"}


def _mask_images(doc_dict: dict) -> dict:
    for pic in doc_dict.get("pictures", []):
        img = pic.get("image")
        if isinstance(img, dict):
            if "uri" in img:
                img["uri"] = "<uri>"
            size = img.get("size", {})
            if not size.get("width") and not size.get("height"):
                pic["image"] = "<image>"
    return doc_dict


def run_one(path: pathlib.Path):
    raw = path.read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    doc = convert_xlsx(raw, name=path.stem, filename=path.name,
                       binary_hash=bh)
    layers = (("body", "furniture", "notes", "invisible")
              if path.stem in _ALL_LAYER_STEMS else ("body",))
    return doc, to_markdown(doc, layers=layers), to_indented_text(doc)


def masked_json(doc) -> str:
    d = _mask_images(json.loads(to_json(doc)))
    return json.dumps(d, ensure_ascii=False, indent=2)


def masked_gt_json(path: pathlib.Path) -> str:
    d = json.load(open(path))
    for pic in d.get("pictures", []):
        img = pic.get("image")
        if isinstance(img, dict) and "uri" in img:
            img["uri"] = "<uri>"
    return json.dumps(d, ensure_ascii=False, indent=2)


def main():
    paths = sorted(SRC.glob("*.xlsx")) + sorted(SRC.glob("*.xlsm"))
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        path = next(p for p in paths if p.stem == stem)
        doc, md, itxt = run_one(path)
        if kind == "json":
            mine = masked_json(doc)
            gt = masked_gt_json(GT / f"{path.name}.json")
        else:
            mine = md if kind == "md" else itxt
            gt = (GT / f"{path.name}.{kind}").read_text()
        import difflib
        for line in difflib.unified_diff(
                gt.splitlines(True), mine.splitlines(True),
                "groundtruth", "ours"):
            sys.stdout.write(line)
        return
    ok_md = ok_itxt = ok_json = err = 0
    for path in paths:
        try:
            doc, md, itxt = run_one(path)
            gmd = GT / f"{path.name}.md"
            gitxt = GT / f"{path.name}.itxt"
            gjson = GT / f"{path.name}.json"
            m = gmd.exists() and gmd.read_text() == md
            i = gitxt.exists() and gitxt.read_text() == itxt
            j = False
            if gjson.exists():
                ours = json.loads(masked_json(doc))
                theirs = json.loads(masked_gt_json(gjson))
                _mask_images(theirs)
                j = ours == theirs
            ok_md += m
            ok_itxt += i
            ok_json += j
            print(f"{path.stem:38s} md={'OK ' if m else 'DIFF'} "
                  f"itxt={'OK ' if i else 'DIFF'} "
                  f"json={'OK ' if j else 'DIFF'}")
        except Exception as exc:
            err += 1
            print(f"{path.stem:38s} ERROR {type(exc).__name__}: {exc}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{len(paths)}  itxt {ok_itxt}/{len(paths)}"
          f"  json {ok_json}/{len(paths)}  errors {err}")


if __name__ == "__main__":
    main()
