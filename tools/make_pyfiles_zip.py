#!/usr/bin/env python
"""Package docling_spark for spark-submit --py-files."""

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]


def main() -> str:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "docling_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "docling_spark").glob("*.py")):
            zf.write(py, f"docling_spark/{py.name}")
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
