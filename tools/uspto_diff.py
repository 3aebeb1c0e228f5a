#!/usr/bin/env python
"""USPTO corpus sweep: convert every reference patent fixture and
byte-compare markdown/itxt/json against the reference groundtruth.

Usage:
  python tools/uspto_diff.py              # summary over all fixtures
  python tools/uspto_diff.py NAME md      # unified diff for one fixture
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.uspto import convert_uspto  # noqa: E402
from docling_spark.serialize import (  # noqa: E402
    to_indented_text, to_json, to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/uspto/sources")
GT = pathlib.Path("/root/reference/tests/data/uspto/groundtruth")


def run_one(path: pathlib.Path):
    raw = path.read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    # the reference names the doc with the full file name (incl. suffix)
    doc = convert_uspto(raw, name=path.name, filename=path.name,
                        binary_hash=bh)
    # the reference exports USPTO itxt with default (no) truncation
    return doc, to_markdown(doc), to_indented_text(doc, max_text_len=None)


def main():
    paths = [p for p in sorted(SRC.iterdir())
             if (GT / f"{p.stem}.md").exists()]
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        path = next(p for p in SRC.iterdir() if p.stem == stem)
        doc, md, itxt = run_one(path)
        if kind == "json":
            mine = to_json(doc, indent=2)
            gt = json.dumps(json.load(open(GT / f"{path.stem}.json")),
                            ensure_ascii=False, indent=2)
        else:
            mine = md if kind == "md" else itxt
            gt = (GT / f"{path.stem}.{kind}").read_text()
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
            m = (GT / f"{path.stem}.md").read_text() == md
            i = (GT / f"{path.stem}.itxt").read_text() == itxt
            j = json.load(open(GT / f"{path.stem}.json")) == \
                json.loads(to_json(doc))
            ok_md += m
            ok_itxt += i
            ok_json += j
            print(f"{path.name:28s} md={'OK ' if m else 'DIFF'} "
                  f"itxt={'OK ' if i else 'DIFF'} "
                  f"json={'OK ' if j else 'DIFF'}")
        except Exception as exc:
            err += 1
            print(f"{path.name:28s} ERROR {type(exc).__name__}: {exc}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{len(paths)}  itxt {ok_itxt}/{len(paths)}"
          f"  json {ok_json}/{len(paths)}  errors {err}")


if __name__ == "__main__":
    main()
