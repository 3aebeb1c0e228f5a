"""Code-language detection (reference ``docling/utils/code_language.py``).

Conservative high-precision markers only - an ambiguous snippet stays
"unknown" (the reference treats ``code_language`` as authoritative
downstream, so a wrong guess is worse than none). The rule set below is
behavior-matched to the reference so the docx json goldens (which carry
detected labels like "SQL"/"Python") reproduce byte-identically.
"""

from __future__ import annotations

import json
import re

# canonical label values (docling-core CodeLanguageLabel .value strings)
UNKNOWN = "unknown"

_ALIASES = {
    "py": "Python", "python2": "Python", "python3": "Python",
    "golang": "Go", "js": "JavaScript", "jsx": "JavaScript",
    "node": "JavaScript", "nodejs": "JavaScript", "ts": "TypeScript",
    "tsx": "TypeScript", "cpp": "C++", "cxx": "C++", "cc": "C++",
    "cs": "C#", "csharp": "C#", "yml": "YAML", "mysql": "SQL",
    "postgres": "SQL", "postgresql": "SQL", "psql": "SQL",
    "sqlite": "SQL", "plsql": "SQL", "tsql": "SQL", "sh": "Bash",
    "shell": "Bash", "zsh": "Bash", "rb": "Ruby", "rs": "Rust",
    "kt": "Kotlin", "kts": "Kotlin", "objc": "Objective-C",
    "objective-c": "Objective-C", "tex": "LaTeX", "vb": "VisualBasic",
    "vbnet": "VisualBasic", "htm": "HTML", "html5": "HTML",
    "xhtml": "HTML",
}
_CANONICAL = {
    v.lower(): v for v in (
        "Python", "Go", "JavaScript", "TypeScript", "C++", "C#", "C",
        "YAML", "SQL", "Bash", "Ruby", "Rust", "Kotlin", "Objective-C",
        "LaTeX", "VisualBasic", "HTML", "Java", "JSON", "PHP", "Perl",
        "Dockerfile", "unknown")
}

_SHEBANG = {"bash": "Bash", "sh": "Bash", "zsh": "Bash",
            "node": "JavaScript", "perl": "Perl", "php": "PHP",
            "python": "Python", "ruby": "Ruby"}
_SHEBANG_RE = re.compile(
    r"^#![^\n]*?\b(bash|zsh|sh|node|perl|php|python|ruby)[0-9.]*\b")
_PHP_RE = re.compile(r"<\?php\b")
_HTML_RE = re.compile(
    r"<!doctype\s+html\b|</(html|head|body)>|<(head|body)[\s>]",
    re.IGNORECASE)
_DOCKER_FROM = re.compile(r"^[ \t]*FROM\s+\S+", re.I | re.M)
_DOCKER_DIR = re.compile(
    r"^[ \t]*(RUN|CMD|COPY|ADD|ENTRYPOINT|WORKDIR|ENV|EXPOSE)\b",
    re.I | re.M)
_CPP_RE = re.compile(r"\bstd::|\bcout\b|\btemplate\s*<|\bnamespace\b")
_C_RE = re.compile(r"\bint\s+main\s*\(|\bprintf\s*\(|\bscanf\s*\(")

_CONTENT_RULES = (
    ("Go", re.compile(
        r"^[ \t]*package\s+main\b|\bfunc\s+\(\w+\s+\*?\w+\)"
        r"|\bfmt\.(Print|Println|Printf)\b", re.M)),
    ("Rust", re.compile(
        r"\bfn\s+main\s*\(|\blet\s+mut\b|\bprintln!\s*\("
        r"|\bfn\s+\w+[^\n]*->")),
    ("Python", re.compile(
        r"^[ \t]*def\s+\w+\s*\([^\n]*\)\s*(->[^\n:]+)?:"
        r"|^[ \t]*elif\b|\b__name__\b|^[ \t]*from\s+\S+\s+import\b",
        re.M)),
    ("Java", re.compile(
        r"\bimport\s+java\.|\bSystem\.out\.print"
        r"|\bpublic\s+static\s+void\s+main")),
    ("C#", re.compile(
        r"\busing\s+System\b|\bConsole\.(Write|WriteLine)\b"
        r"|\bnamespace\s+[\w.]+\s*[{;]")),
    ("SQL", re.compile(
        r"^[ \t]*select\b(?:(?!\bfrom\b)[^\n])*(?:\n[ \t]*)?\bfrom\b"
        r"(?:(?!\bwhere\b|\bjoin\b|\bgroup\s+by\b|\border\s+by\b|;)[^\n])*"
        r"(?:\n[ \t]*)?(\bwhere\b|\bjoin\b|\bgroup\s+by\b|\border\s+by\b|;)"
        r"|^[ \t]*insert\s+into\s+\w+\s*(\(|values\b|select\b)"
        r"|^[ \t]*update\s+\w+\s+set\b[^\n]*?="
        r"|^[ \t]*delete\s+from\s+\w+\s*(\bwhere\b|;)"
        r"|^[ \t]*create\s+(table|view|index|database)\s+"
        r"(if\s+not\s+exists\s+)?\w+\s*(\(|as\b)"
        r"|^[ \t]*alter\s+table\s+\w+\s+(add|drop|modify|alter|rename)\b"
        r"|^[ \t]*drop\s+(table|view|index|database)\s+"
        r"(if\s+exists\s+)?\w+\s*;", re.I | re.M)),
    ("TypeScript", re.compile(
        r"\b(readonly|public|private|protected)\s+\w+\s*:\s*\w+"
        r"|:\s*(string|number|boolean)(\[\])?\s*[;,)=]")),
    ("JavaScript", re.compile(
        r"\bconsole\.log\s*\(|\brequire\s*\(|\bmodule\.exports\b"
        r"|\bdocument\.(getElementById|querySelector)\b")),
)


def normalize_code_language(hint) -> str:
    if not hint:
        return UNKNOWN
    token = str(hint).strip().lower()
    for prefix in ("language-", "lang-"):
        if token.startswith(prefix):
            token = token[len(prefix):]
            break
    return _CANONICAL.get(token) or _ALIASES.get(token, UNKNOWN)


def detect_code_language(text: str, hint=None) -> str:
    label = normalize_code_language(hint)
    if label != UNKNOWN:
        return label
    if not text or not text.strip():
        return UNKNOWN
    head = text.lstrip()
    m = _SHEBANG_RE.match(head)
    if m:
        return _SHEBANG[m.group(1)]
    if _PHP_RE.search(text):
        return "PHP"
    if _HTML_RE.search(text):
        return "HTML"
    if _DOCKER_FROM.search(text) and _DOCKER_DIR.search(text):
        return "Dockerfile"
    if "#include" in text:
        if _CPP_RE.search(text):
            return "C++"
        if _C_RE.search(text):
            return "C"
    for label, pattern in _CONTENT_RULES:
        if pattern.search(text):
            return label
    stripped = text.strip()
    if stripped and stripped[0] in "{[":
        try:
            json.loads(stripped)
            return "JSON"
        except ValueError:
            pass
    return UNKNOWN
