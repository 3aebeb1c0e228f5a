#!/usr/bin/env python
"""JATS corpus sweep: convert every reference jats fixture and byte-compare
markdown/itxt/json against the reference groundtruth.

Usage:
  python tools/jats_diff.py              # summary over all fixtures
  python tools/jats_diff.py NAME md      # unified diff for one fixture
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.jats import convert_jats  # noqa: E402
from docling_spark.serialize import (  # noqa: E402
    to_indented_text, to_json, to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/jats/sources")
GT = pathlib.Path("/root/reference/tests/data/jats/groundtruth")


def run_one(path: pathlib.Path):
    raw = path.read_bytes()
    bh = int.from_bytes(hashlib.sha256(raw).digest()[-8:], "big")
    doc = convert_jats(raw, name=path.stem, filename=path.name,
                       binary_hash=bh)
    return doc, to_markdown(doc), to_indented_text(doc)


def main():
    paths = [p for p in sorted(SRC.iterdir())
             if p.suffix in (".xml", ".nxml")]
    if len(sys.argv) > 1 and sys.argv[1] != "all":
        stem = sys.argv[1]
        kind = sys.argv[2] if len(sys.argv) > 2 else "md"
        path = next(p for p in paths if p.stem == stem)
        doc, md, itxt = run_one(path)
        if kind == "json":
            mine = to_json(doc, indent=2)
            gt = json.dumps(json.load(open(GT / f"{path.name}.json")),
                            ensure_ascii=False, indent=2)
        else:
            mine = md if kind == "md" else itxt
            gt = (GT / f"{path.name}.{kind}").read_text()
        import difflib
        for line in difflib.unified_diff(
                gt.splitlines(True), mine.splitlines(True),
                "groundtruth", "ours"):
            sys.stdout.write(line)
        return
    ok_md = ok_itxt = ok_json = n = n_json = err = 0
    for path in paths:
        gmd = GT / f"{path.name}.md"
        if not gmd.exists():
            continue
        n += 1
        try:
            doc, md, itxt = run_one(path)
            m = gmd.read_text() == md
            i = (GT / f"{path.name}.itxt").read_text() == itxt
            gt_json = GT / f"{path.name}.json"
            j = None
            if gt_json.exists():
                n_json += 1
                j = json.load(open(gt_json)) == json.loads(to_json(doc))
            ok_md += m
            ok_itxt += i
            ok_json += bool(j)
            jtxt = "n/a " if j is None else ("OK " if j else "DIFF")
            print(f"{path.name:28s} md={'OK ' if m else 'DIFF'} "
                  f"itxt={'OK ' if i else 'DIFF'} json={jtxt}")
        except Exception as exc:
            err += 1
            print(f"{path.name:28s} ERROR {type(exc).__name__}: {exc}")
            if "-v" in sys.argv[2:]:
                traceback.print_exc()
    print(f"\nTOTAL: md {ok_md}/{n}  itxt {ok_itxt}/{n}"
          f"  json {ok_json}/{n_json}  errors {err}")


if __name__ == "__main__":
    main()
