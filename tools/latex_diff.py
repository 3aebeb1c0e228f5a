#!/usr/bin/env python
"""LaTeX corpus sweep: convert each reference fixture, diff vs groundtruth.

Usage:
    python tools/latex_diff.py            # summary table
    python tools/latex_diff.py STEM [md|itxt]  # unified diff for one
"""

from __future__ import annotations

import difflib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from docling_spark.latex import convert_latex  # noqa: E402
from docling_spark.serialize import (to_indented_text,  # noqa: E402
                                     to_markdown)

SRC = pathlib.Path("/root/reference/tests/data/latex/sources")
GT = pathlib.Path("/root/reference/tests/data/latex/groundtruth")


def fixtures():
    out = []
    for p in sorted(SRC.iterdir()):
        if p.is_file() and p.suffix == ".tex":
            out.append((p.stem, p.read_bytes(), None, p.stem + ".tex"))
        elif p.is_dir():
            main = p / "main.tex"
            if not main.exists():
                cands = sorted(p.glob("*.tex"))
                main = cands[0] if cands else None
            if main is None:
                continue
            inputs = {}
            for f in p.rglob("*"):
                if f.is_file() and f.suffix in (".tex", ".sty", ".bbl",
                                                ".cls"):
                    inputs[str(f.relative_to(p))] = f.read_bytes()
                    inputs[f.name] = f.read_bytes()
            out.append((f"{p.name}_main", main.read_bytes(), inputs,
                        "main.tex"))
    return out


def convert(stem, raw, inputs, fname):
    doc = convert_latex(raw, name=fname.rsplit(".", 1)[0], filename=fname,
                        inputs=inputs)
    return to_markdown(doc), to_indented_text(doc)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    fmt = sys.argv[2] if len(sys.argv) > 2 else "md"
    total_md = ok_md = total_itxt = ok_itxt = 0
    for stem, raw, inputs, fname in fixtures():
        if only and only not in stem:
            continue
        gt_md = GT / f"{stem}.tex.md"
        gt_itxt = GT / f"{stem}.tex.itxt"
        if not gt_md.exists():
            continue
        try:
            md, itxt = convert(stem, raw, inputs, fname)
        except Exception as e:
            print(f"{stem:28s} ERROR {type(e).__name__}: {e}")
            total_md += 1
            total_itxt += 1
            continue
        exp_md = gt_md.read_text()
        exp_itxt = gt_itxt.read_text() if gt_itxt.exists() else None
        md_ok = md == exp_md
        itxt_ok = exp_itxt is None or itxt == exp_itxt
        total_md += 1
        ok_md += md_ok
        if exp_itxt is not None:
            total_itxt += 1
            ok_itxt += itxt_ok
        dl_md = 0 if md_ok else len(list(difflib.unified_diff(
            md.splitlines(), exp_md.splitlines(), lineterm="")))
        if only:
            got, exp = (md, exp_md) if fmt == "md" else (itxt, exp_itxt)
            for line in difflib.unified_diff(
                    (got or "").splitlines(), (exp or "").splitlines(),
                    "ours", "groundtruth", lineterm=""):
                print(line)
            return
        print(f"{stem:28s} md={'OK ' if md_ok else f'{dl_md:4d}'} "
              f"itxt={'OK' if itxt_ok else 'DIFF'}")
    print(f"\nTOTAL md {ok_md}/{total_md}  itxt {ok_itxt}/{total_itxt}")


if __name__ == "__main__":
    main()
