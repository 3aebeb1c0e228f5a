#!/usr/bin/env python
"""ODF corpus sweep: convert every reference odt/ods/odp fixture and
byte-compare markdown, itxt, and json (picture image.uri masked) against
the reference groundtruth.

Usage:
  python tools/odf_diff.py              # summary over all fixtures
  python tools/odf_diff.py NAME md      # unified diff for one fixture
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.odf import convert_odf  # noqa: E402
from docling_spark.serialize import (  # noqa: E402
    to_indented_text, to_json, to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/odf/sources")
GT = pathlib.Path("/root/reference/tests/data/odf/groundtruth")


def run_one(path: pathlib.Path):
    raw = path.read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    doc = convert_odf(raw, name=path.stem, filename=path.name,
                      binary_hash=bh)
    return doc, to_markdown(doc), to_indented_text(doc)


def masked(doc_json: str) -> str:
    d = json.loads(doc_json)
    for pic in d.get("pictures", []):
        if isinstance(pic.get("image"), dict) and "uri" in pic["image"]:
            pic["image"]["uri"] = "<uri>"
    return json.dumps(d, ensure_ascii=False, indent=2)


def main():
    paths = [p for p in sorted(SRC.iterdir())
             if p.suffix in (".odt", ".ods", ".odp")]
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        path = next(p for p in paths if p.stem == stem)
        doc, md, itxt = run_one(path)
        if kind == "json":
            mine = masked(to_json(doc))
            gt = masked((GT / f"{path.name}.json").read_text())
        else:
            mine = md if kind == "md" else itxt
            gt = (GT / f"{path.name}.{kind}").read_text()
        import difflib
        for line in difflib.unified_diff(
                gt.splitlines(True), mine.splitlines(True),
                "groundtruth", "ours"):
            sys.stdout.write(line)
        return
    ok_md = ok_itxt = ok_json = n_json = err = 0
    for path in paths:
        try:
            doc, md, itxt = run_one(path)
            m = (GT / f"{path.name}.md").read_text() == md
            i = (GT / f"{path.name}.itxt").read_text() == itxt
            gt_json = GT / f"{path.name}.json"
            j = None
            if gt_json.exists():
                n_json += 1
                j = masked(gt_json.read_text()) == masked(to_json(doc))
            ok_md += m
            ok_itxt += i
            ok_json += bool(j)
            jtxt = "n/a " if j is None else ("OK " if j else "DIFF")
            print(f"{path.name:32s} md={'OK ' if m else 'DIFF'} "
                  f"itxt={'OK ' if i else 'DIFF'} json={jtxt}")
        except Exception as exc:
            err += 1
            print(f"{path.name:32s} ERROR {type(exc).__name__}: {exc}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{len(paths)}  itxt {ok_itxt}/{len(paths)}"
          f"  json {ok_json}/{n_json}  errors {err}")


if __name__ == "__main__":
    main()
