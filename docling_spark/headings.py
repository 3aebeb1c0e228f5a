"""Section-header level inference (heading hierarchy).

Reimplements the deterministic strategies of the reference's
``HeadingHierarchyModel`` (``models/stages/heading_hierarchy/
heading_hierarchy_model.py``; strategy docstring at :10-24):

2. **numbering** - legal/outline markers (``PART I -> 1. -> 1.1 -> (a) ->
   (i)``) with document-wide resolution of single-letter Roman/alpha
   ambiguity and compression of the observed (family, depth) keys into
   contiguous levels;
3. **style** - font-size buckets (largest size = level 1) for headings
   without usable numbering, when sizes are supplied.

Strategy 1 (PDF bookmarks) requires the outline artifact, which the
deterministic path has no access to - callers may pass explicit levels
instead. Only levels are rewritten; items are never added/removed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence

FAMILY_ORDER = [
    "part",     # PART I / TITLE I / BOOK I
    "chapter",  # CHAPTER 1
    "article",  # ARTICLE 1 / SECTION 1 / Clause / § 1
    "roman_u",  # I. II. III.
    "arabic",   # 1. 2. 3. (dotted 1.1 ranks with arabic, deeper by depth)
    "alpha_u",  # A. B. C.
    "alpha_l",  # (a) (b) (c)
    "roman_l",  # (i) (ii) (iii)
]

_ROMAN_SINGLES = set("IVXLCDMivxlcdm")
_ROMAN_RE = re.compile(
    r"^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})$",
    re.IGNORECASE)
_KW_PART = re.compile(r"^(part|title|book)\b", re.IGNORECASE)
_KW_CHAPTER = re.compile(r"^(chapter)\b", re.IGNORECASE)
_KW_ARTICLE = re.compile(
    r"^(article|section|clause|schedule|annex|appendix|rule)\b",
    re.IGNORECASE)
_SECTION_SYMBOL = re.compile(r"^§+\s*\d")
_DOTTED = re.compile(r"^(\d+(?:\.\d+)+)(?:[.)\]\s]|$)")
_ARABIC = re.compile(r"^(\d+)[.)]")
_LETTER = re.compile(r"^\(?\s*([A-Za-z]+)\s*[).]")


@dataclass
class Marker:
    family: str
    depth: int = 1
    token: Optional[str] = None
    ambiguous: bool = False


def _is_roman(token: str) -> bool:
    return bool(token) and _ROMAN_RE.fullmatch(token) is not None


def _classify_letter(token: str) -> Optional[Marker]:
    upper = token.isupper()
    if len(token) == 1:
        if token in _ROMAN_SINGLES:
            return Marker(family="roman_u" if upper else "roman_l",
                          token=token, ambiguous=True)
        return Marker(family="alpha_u" if upper else "alpha_l", token=token)
    if _is_roman(token):
        return Marker(family="roman_u" if upper else "roman_l", token=token)
    return None  # multi-letter non-Roman = a word, not numbering


def parse_marker(text: str) -> Optional[Marker]:
    """Leading numbering marker of a heading, or None if unnumbered."""
    s = (text or "").strip()
    if not s:
        return None
    if _KW_PART.match(s):
        return Marker(family="part")
    if _KW_CHAPTER.match(s):
        return Marker(family="chapter")
    if _KW_ARTICLE.match(s) or _SECTION_SYMBOL.match(s):
        return Marker(family="article")
    m = _DOTTED.match(s)
    if m:
        return Marker(family="dotted", depth=m.group(1).count(".") + 1)
    if _ARABIC.match(s):
        return Marker(family="arabic")
    m = _LETTER.match(s)
    if m:
        return _classify_letter(m.group(1))
    return None


def resolve_ambiguous(markers: list[Optional[Marker]]) -> None:
    """Resolve single-letter Roman/alpha markers with document-wide
    evidence; 'I'/'i' default to Roman, other letters to alpha."""
    def has(family: str) -> bool:
        return any(m is not None and not m.ambiguous and m.family == family
                   for m in markers)

    upper_roman, upper_alpha = has("roman_u"), has("alpha_u")
    lower_roman, lower_alpha = has("roman_l"), has("alpha_l")
    for m in markers:
        if m is None or not m.ambiguous or m.token is None:
            continue
        upper = m.token.isupper()
        has_roman = upper_roman if upper else lower_roman
        has_alpha = upper_alpha if upper else lower_alpha
        if has_roman and not has_alpha:
            roman = True
        elif has_alpha and not has_roman:
            roman = False
        else:
            roman = m.token in ("I", "i")
        m.family = (("roman_u" if upper else "roman_l") if roman
                    else ("alpha_u" if upper else "alpha_l"))
        m.ambiguous = False


def _family_rank(family: str, order: list[str]) -> int:
    key = "arabic" if family == "dotted" else family
    try:
        return order.index(key)
    except ValueError:
        return len(order)


def infer_from_numbering(texts: Sequence[str],
                         order: Optional[list[str]] = None) -> dict[int, int]:
    """heading index -> level from numbering markers; levels are the
    observed (rank, depth) keys compressed to 1..K."""
    order = order or FAMILY_ORDER
    markers = [parse_marker(t) for t in texts]
    resolve_ambiguous(markers)
    keys = {i: (_family_rank(m.family, order), m.depth)
            for i, m in enumerate(markers) if m is not None}
    if not keys:
        return {}
    key_to_level = {key: lvl for lvl, key in
                    enumerate(sorted(set(keys.values())), start=1)}
    return {i: key_to_level[k] for i, k in keys.items()}


def infer_from_style(font_sizes: dict[int, float]) -> dict[int, int]:
    """heading index -> level from rounded font-size buckets
    (largest = level 1)."""
    if not font_sizes:
        return {}
    rounded = {i: round(s) for i, s in font_sizes.items()}
    ranked = {size: lvl for lvl, size in
              enumerate(sorted(set(rounded.values()), reverse=True), start=1)}
    return {i: ranked[s] for i, s in rounded.items()}


def infer_heading_levels(
    texts: Sequence[str],
    font_sizes: Optional[dict[int, float]] = None,
) -> dict[int, int]:
    """Numbering first; style fallback for headings without a marker."""
    levels = infer_from_numbering(texts)
    if font_sizes:
        style = infer_from_style(
            {i: s for i, s in font_sizes.items() if i not in levels})
        # style levels sit below the deepest numbered level
        base = max(levels.values(), default=0)
        for i, lvl in style.items():
            levels[i] = base + lvl if levels else lvl
    return levels


# ------------------------------------------------------------- bookmarks
# (reference: heading_hierarchy_model.py:251-400 - the outline is the
# document's own declared hierarchy; fuzzy title match, claimed-once,
# depth compression, list-item promotion)

_LEADING_MARKER_RE = re.compile(
    r"^\s*(?:"
    r"(?:part|title|book|chapter|article|section|clause|schedule|annex"
    r"|appendix|rule)\b[\s.:]*[0-9ivxlcdm]*"
    r"|§+\s*[0-9.]+"
    r"|\(?[0-9]+(?:\.[0-9]+)*[).]?"
    r"|\(?[A-Za-z]{1,2}[).]"
    r")[\s.:)\-]*",
    re.IGNORECASE,
)


def _norm_title(text: str) -> str:
    s = re.sub(r"\s+", " ", (text or "").lower()).strip()
    return re.sub(r"^[\W_]+|[\W_]+$", "", s)


def _strip_leading_marker(text: str) -> str:
    return _LEADING_MARKER_RE.sub("", text or "", count=1)


def bookmark_match_score(cand_text: str, bm_title: str) -> float:
    """Fuzzy 0..1 similarity between a detected heading and a bookmark
    title; both compared with and without leading numbering markers,
    containment of one >=4-char normalized title in the other scores
    0.92 (bookmarks are frequently truncated)."""
    from difflib import SequenceMatcher
    va = {_norm_title(cand_text),
          _norm_title(_strip_leading_marker(cand_text))} - {""}
    vb = {_norm_title(bm_title),
          _norm_title(_strip_leading_marker(bm_title))} - {""}
    best = 0.0
    for a in va:
        for b in vb:
            best = max(best, SequenceMatcher(None, a, b).ratio())
            if len(a) >= 4 and len(b) >= 4 and (a in b or b in a):
                best = max(best, 0.92)
    return best


def infer_from_bookmarks(doc, outline, threshold: float = 0.8
                         ) -> dict[int, int]:
    """Match (level, title) outline entries to headings/list-items.

    Returns ``id(item) -> level`` (bookmark depths compressed to
    contiguous 1-based levels). A confidently matched LIST ITEM is
    promoted in place to a SectionHeaderItem (layout heuristics often
    read a numbered heading as a list item). Our outline carries no
    page targets, so the stricter cross-page threshold (+0.1) applies,
    as in the reference's docling-parse outline path.
    """
    from .model import ListItemItem, SectionHeaderItem
    if not outline:
        return {}
    threshold = min(1.0, threshold + 0.1)
    candidates = [t for t in doc.texts
                  if isinstance(t, (SectionHeaderItem, ListItemItem))]
    if not candidates:
        return {}
    claimed: set[int] = set()
    matches: list[tuple[object, int]] = []
    for level, title in outline:
        title = (title or "").strip()
        if not title:
            continue
        best_idx, best_score = None, 0.0
        for idx, item in enumerate(candidates):
            if idx in claimed:
                continue
            score = bookmark_match_score(item.text, title)
            if score >= threshold and score > best_score + 1e-6:
                best_idx, best_score = idx, score
        if best_idx is not None:
            claimed.add(best_idx)
            matches.append((candidates[best_idx], level))
    if not matches:
        return {}
    used = sorted({lvl for _, lvl in matches})
    level_map = {lvl: i + 1 for i, lvl in enumerate(used)}
    out: dict[int, int] = {}
    for item, raw in matches:
        level = level_map[raw]
        if isinstance(item, ListItemItem):
            promoted = _promote_list_item(doc, item, level)
            out[id(promoted)] = level
        else:
            out[id(item)] = level
    return out


def _promote_list_item(doc, item, level):
    """Replace a ListItemItem with a SectionHeaderItem in place (same
    self_ref / tree position; the marker rejoins the text)."""
    from .model import SectionHeaderItem
    text = item.text
    if getattr(item, "marker", ""):
        text = f"{item.marker} {text}".strip()
    heading = SectionHeaderItem(
        item.self_ref, item.parent_ref, "section_header", text,
        orig=item.orig, formatting=item.formatting,
        hyperlink=item.hyperlink, content_layer=item.content_layer,
        level=level)
    heading.prov = item.prov
    heading.children = item.children
    idx = int(item.self_ref.rsplit("/", 1)[1])
    doc.texts[idx] = heading
    return heading


def apply_heading_hierarchy(doc, font_sizes=None, outline=None) -> int:
    """Rewrite SectionHeaderItem.level in a Doc; returns #rewritten.

    Precedence mirrors the reference (heading_hierarchy_model.py:427-471):
    bookmarks (authoritative, may promote list items) > numbering >
    style; unmatched headings keep their level.
    """
    from .model import SectionHeaderItem
    bookmark_levels = infer_from_bookmarks(doc, outline) if outline else {}
    headings = [t for t in doc.texts if isinstance(t, SectionHeaderItem)]
    levels: dict[int, int] = {}
    for i, h in enumerate(headings):
        bl = bookmark_levels.get(id(h))
        if bl is not None:
            levels[i] = bl
    inferred = infer_heading_levels([h.text for h in headings], font_sizes)
    for i, lvl in inferred.items():
        levels.setdefault(i, lvl)
    n = 0
    for i, h in enumerate(headings):
        if i in levels and h.level != levels[i]:
            h.level = max(1, min(int(levels[i]), 6))
            n += 1
    return n
