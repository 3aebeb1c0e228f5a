"""Text cleanup + code-language detection used by the HTML extractor.

``clean_unicode`` reimplements the reference's fixed replacement table
(``/root/reference/docling/backend/html_backend.py:4569-4606``) - byte
identity of extracted text depends on this exact mapping.
"""

from __future__ import annotations

import re

_REPLACEMENTS = {
    " ": " ",   # non-breaking space
    "​": "",    # zero-width space
    "‌": "",    # zero-width non-joiner
    "‍": "",    # zero-width joiner
    "‐": "-",   # hyphen
    "‑": "-",   # non-breaking hyphen
    "‒": "-",   # figure dash
    "–": "-",   # en dash
    "—": "-",   # em dash
    "―": "-",   # horizontal bar
    "‘": "'",   # left single quote
    "’": "'",   # right single quote
    "“": '"',   # left double quote
    "”": '"',   # right double quote
    "…": "...", # ellipsis
    "­": "",    # soft hyphen
    "﻿": "",    # BOM / zero-width no-break space
    " ": " ",   # narrow no-break space
    "⁠": "",    # word joiner
}

_TRANSLATE = str.maketrans(
    {k: v for k, v in _REPLACEMENTS.items() if len(k) == 1}
)


def clean_unicode(text: str) -> str:
    return text.translate(_TRANSLATE)


# --- code language detection -------------------------------------------------
# Light reimplementation of the reference's detect_code_language
# (``/root/reference/docling/utils/code_language.py``): a class-attribute hint
# (language-/lang- prefixed) wins; otherwise a few cheap content heuristics;
# fallback "unknown".

HINT_PREFIXES = ("language-", "lang-", "sourcecode", "source-", "brush:", "highlight-")

_KNOWN_LANGS = {
    "python": "Python", "py": "Python", "java": "Java", "javascript": "JavaScript",
    "js": "JavaScript", "typescript": "TypeScript", "ts": "TypeScript",
    "c": "C", "cpp": "C++", "c++": "C++", "csharp": "C#", "c#": "C#",
    "go": "Go", "golang": "Go", "rust": "Rust", "ruby": "Ruby", "php": "PHP",
    "bash": "Bash", "sh": "Shell", "shell": "Shell", "sql": "SQL",
    "html": "HTML", "css": "CSS", "xml": "XML", "json": "JSON",
    "yaml": "YAML", "yml": "YAML", "markdown": "Markdown", "md": "Markdown",
    "kotlin": "Kotlin", "swift": "Swift", "scala": "Scala", "perl": "Perl",
    "r": "R", "lua": "Lua", "dart": "Dart", "haskell": "Haskell",
}


def normalize_code_language(token: str) -> str | None:
    t = token.lower().strip()
    for p in HINT_PREFIXES:
        if t.startswith(p):
            t = t[len(p):]
            break
    return _KNOWN_LANGS.get(t)


_PY_RE = re.compile(r"^\s*(def |class |import |from \S+ import )", re.M)
_SHELL_RE = re.compile(r"^\s*\$ ", re.M)


def detect_code_language(text: str, hint: str | None = None) -> str:
    if hint:
        norm = normalize_code_language(hint)
        if norm:
            return norm
    if _PY_RE.search(text):
        return "Python"
    if _SHELL_RE.search(text):
        return "Shell"
    return "unknown"
