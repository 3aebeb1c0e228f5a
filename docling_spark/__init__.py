"""docling_spark — PySpark-native web-document extraction engine.

A from-scratch reimplementation of the reference extraction semantics
(docling-project/docling) as vectorized per-partition dataflow over
Common-Crawl-style page tables. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .extractor import HtmlExtractor, extract  # noqa: F401
from .serialize import to_indented_text, to_json, to_markdown  # noqa: F401
