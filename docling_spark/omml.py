"""OMML (Office Math Markup Language) -> LaTeX, stdlib-only.

Produces the same LaTeX strings as the reference's converter
(``docling/backend/docx/latex/omml.py``, itself adapted from the public
dwml project) for the constructs exercised by the reference's goldens:
fractions, sub/superscripts, delimiters, n-ary operators, functions,
radicals, accents, bars, group-chars, limits, matrices and equation
arrays. Implemented as flat recursive functions over ElementTree (the
reference dispatches via a Tag2Method class over lxml).

The reference encodes non-ASCII via pylatexenc (absent here); the small
symbol table below reproduces its observable output shape: a math symbol
char X becomes ``"  \\X  "`` (double-spaced, later squeezed), ellipsis
becomes a ``\\text{ \\textellipsis }`` wrap, dashes/multiplication map to
math operators, and unknown characters pass through unchanged.
"""

from __future__ import annotations

from xml.etree import ElementTree as ET

M_NS = "http://schemas.openxmlformats.org/officeDocument/2006/math"


def _m(tag: str) -> str:
    return f"{{{M_NS}}}{tag}"


_ESCAPE_CHARS = ("{", "}", "_", "^", "#", "&", "$", "%", "~")
_MATH_CHARS = ("\\", "<", ">", "=", "+", "*", "/", "^", "_", "{", "}")

# chars mapped straight to math operators (before any text-mode encoding)
_MATH_OP = {
    "–": "-", "—": "-", "−": "-",
    "^": "^", "×": "\\times ",
}

_GREEK = {
    "alpha": 0x3b1, "beta": 0x3b2, "gamma": 0x3b3, "delta": 0x3b4,
    "varepsilon": 0x3b5, "zeta": 0x3b6, "eta": 0x3b7, "theta": 0x3b8,
    "iota": 0x3b9, "kappa": 0x3ba, "lambda": 0x3bb, "mu": 0x3bc,
    "nu": 0x3bd, "xi": 0x3be, "pi": 0x3c0, "rho": 0x3c1,
    "varsigma": 0x3c2, "sigma": 0x3c3, "tau": 0x3c4, "upsilon": 0x3c5,
    "varphi": 0x3c6, "chi": 0x3c7, "psi": 0x3c8, "omega": 0x3c9,
    "epsilon": 0x3f5, "vartheta": 0x3d1, "phi": 0x3d5, "varpi": 0x3d6,
    "varrho": 0x3f1,
    "Gamma": 0x393, "Delta": 0x394, "Theta": 0x398, "Lambda": 0x39b,
    "Xi": 0x39e, "Pi": 0x3a0, "Sigma": 0x3a3, "Upsilon": 0x3a5,
    "Phi": 0x3a6, "Psi": 0x3a8, "Omega": 0x3a9,
}

# symbol -> latex name rendered as "  \name  " (the ensuremath dance)
_MATH_SYM = {chr(cp): name for name, cp in _GREEK.items()}
_MATH_SYM.update({
    "±": "pm", "∓": "mp", "∞": "infty",
    "∩": "cap", "∪": "cup", "≤": "leq", "≥": "geq",
    "≠": "ne", "≈": "approx", "≡": "equiv",
    "⋅": "cdot", "÷": "div", "∈": "in", "∉": "notin",
    "⊂": "subset", "⊆": "subseteq", "→": "rightarrow",
    "←": "leftarrow", "⇒": "Rightarrow", "∀": "forall",
    "∃": "exists", "∂": "partial", "∇": "nabla",
    "√": "surd", "∅": "emptyset",
})

_TEXT_SYM = {"…": "textellipsis", " ": "~"}

# n-ary big operators (naryPr chr value -> command; default integral)
_NARY = {
    "⅀": "\\Bbbsum", "∏": "\\prod", "∐": "\\coprod",
    "∑": "\\sum", "∫": "\\int", "∬": "\\iint",
    "∭": "\\iiint", "∮": "\\oint", "∯": "\\oiint",
    "∰": "\\oiiint", "⋀": "\\bigwedge", "⋁": "\\bigvee",
    "⋂": "\\bigcap", "⋃": "\\bigcup", "⨀": "\\bigodot",
    "⨁": "\\bigoplus", "⨂": "\\bigotimes",
}

# combining accents / group chars: template with %s slot
_ACCENTS = {
    "̀": "\\grave{%s}", "́": "\\acute{%s}", "̂": "\\hat{%s}",
    "̃": "\\tilde{%s}", "̄": "\\bar{%s}", "̅": "\\overbar{%s}",
    "̆": "\\breve{%s}", "̇": "\\dot{%s}", "̈": "\\ddot{%s}",
    "̌": "\\check{%s}", "̸": "\\not{%s}", "⃗": "\\vec{%s}",
    "⃖": "\\overleftarrow{%s}", "⃛": "\\dddot{%s}",
    "⃡": "\\overleftrightarrow{%s}",
    "̰": "\\wideutilde{%s}", "̱": "\\underbar{%s}",
    "⎴": "\\overbracket{%s}", "⏜": "\\overparen{%s}",
    "⏞": "\\overbrace{%s}", "⎵": "\\underbracket{%s}",
    "⏝": "\\underparen{%s}", "⏟": "\\underbrace{%s}",
}

_FUNC = {
    name: f"\\{name}({{fe}})"
    for name in ("sin cos tan arcsin arccos arctan arccot sinh cosh tanh "
                 "coth sec csc max min log ln exp det gcd deg hom ker dim "
                 "arg inf sup lim Pr").split()
}
_FUNC["mod"] = "\\mod {fe}"
_FUNC_PLACE = "{fe}"

_FRAC = {
    "bar": "\\frac{%(num)s}{%(den)s}",
    "skw": r"^{%(num)s}/_{%(den)s}",
    "noBar": "\\genfrac{}{}{0pt}{}{%(num)s}{%(den)s}",
    "lin": "{%(num)s}/{%(den)s}",
}
_FRAC_DEFAULT = "\\frac{%(num)s}{%(den)s}"

_LIM_FUNC = {
    "lim": "\\lim_{%(lim)s}", "max": "\\max_{%(lim)s}",
    "min": "\\min_{%(lim)s}",
    "argmax": "\\operatorname{argmax}_{%(lim)s}",
    "argmin": "\\operatorname{argmin}_{%(lim)s}",
}
_GROUPING_FUNCS = ("\\underbrace", "\\overbrace", "\\underparen",
                   "\\overparen", "\\underbracket", "\\overbracket")

_BRK = "\\\\"

# math-alphanumeric italic letters -> plain ASCII (tight, no spacing)
_ITALIC_LATIN = {}
for i in range(26):
    _ITALIC_LATIN[chr(0x1D434 + i)] = chr(ord("A") + i)
    if 0x1D44E + i != 0x1D455:  # italic h is reserved -> U+210E
        _ITALIC_LATIN[chr(0x1D44E + i)] = chr(ord("a") + i)
_ITALIC_LATIN["ℎ"] = "h"
_ITALIC_GREEK_ORDER = (
    "alpha beta gamma theta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho varsigma sigma tau upsilon phi chi psi omega "
    "partial varepsilon vartheta varkappa varphi varrho varpi").split()
_ITALIC_GREEK = {chr(0x1D6FC + i): f"\\{name} "
                 for i, name in enumerate(_ITALIC_GREEK_ORDER)}


def _escape_latex(s: str) -> str:
    last = None
    out = []
    s = s.replace(r"\\", "\\")
    for c in s:
        if c in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + c)
        else:
            out.append(c)
        last = c
    return "".join(out)


def _encode_char(c: str) -> str:
    """Reference process_unicode equivalent (pylatexenc replaced by the
    tables above)."""
    if c in _MATH_OP:
        return _MATH_OP[c]
    if c in ("<", ">"):
        # pylatexenc encodes these via \ensuremath -> double-spaced
        return f"  {c}  "
    if ord(c) < 128:
        return c
    if c in _MATH_SYM:
        return f"  \\{_MATH_SYM[c]}  "
    if c in _TEXT_SYM:
        return f" \\text{{ \\{_TEXT_SYM[c]} }} "
    if c in _ITALIC_LATIN:
        return _ITALIC_LATIN[c]
    if c in _ITALIC_GREEK:
        return _ITALIC_GREEK[c]
    return c  # unknown char: keep


class _Pr:
    """Collected property values (chr/pos/begChr/endChr/type) + passthrough
    text of nested content (e.g. sub in naryPr renders nothing)."""

    def __init__(self, elm):
        self.vals = {}
        self.text = ""
        for child in elm:
            tag = child.tag.rsplit("}", 1)[-1]
            if tag in ("chr", "pos", "begChr", "endChr", "type"):
                self.vals[tag] = child.get(_m("val"))
            elif tag == "brk":
                self.text += _BRK

    def get(self, key):
        return self.vals.get(key)

    def __str__(self):
        return self.text


def _children(elm, include=None):
    """(tag, latex, element) for math-namespace children."""
    for e in elm:
        if not e.tag.startswith(f"{{{M_NS}}}"):
            continue
        tag = e.tag.rsplit("}", 1)[-1]
        if include and tag not in include:
            continue
        val = _convert(e, tag)
        if val is None:
            continue
        yield tag, val, e


def _concat(elm, include=None) -> str:
    return "".join(str(v) for _t, v, _e in _children(elm, include))


def _cdict(elm, include=None) -> dict:
    return {t: v for t, v, _e in _children(elm, include)}


def _needs_grouping(s: str) -> bool:
    return "\\frac" in s or "\\sqrt" in s


def _unwrap_script(script: str, marker: str) -> str:
    prefix = f"{marker}{{"
    if script.startswith(prefix) and script.endswith("}"):
        return script[len(prefix):-1]
    return script


def _do_r(elm) -> str:
    text = elm.findtext(f"./{_m('t')}")
    if not text:
        return ""
    encoded = "".join(_encode_char(c) for c in text)
    proc = _escape_latex(encoded)
    if "{" not in text and "\\{" in proc:
        proc = proc.replace("\\{", "{")
    if "}" not in text and "\\}" in proc:
        proc = proc.replace("\\}", "}")
    # un-escape chars intentionally mapped to math operators
    for orig, mapped in _MATH_OP.items():
        if (mapped in _ESCAPE_CHARS and orig in text
                and f"\\{mapped}" in proc):
            proc = proc.replace(f"\\{mapped}", mapped)
    return proc


def _do_acc(elm) -> str:
    d = _cdict(elm)
    pr = d.get("accPr")
    chrv = pr.get("chr") if isinstance(pr, _Pr) else None
    tpl = _ACCENTS.get(chrv, chrv) if chrv is not None else "\\hat{%s}"
    return tpl % (d.get("e", ""),) if "%s" in tpl else tpl


def _do_bar(elm) -> str:
    d = _cdict(elm)
    pr = d.get("barPr")
    pos = pr.get("pos") if isinstance(pr, _Pr) else None
    tpl = {"top": "\\overline{%s}", "bot": "\\underline{%s}"}.get(
        pos, "\\overline{%s}")
    prefix = pr.text if isinstance(pr, _Pr) else ""
    return prefix + (tpl % (d.get("e", ""),) if "%s" in tpl else tpl)


def _do_d(elm) -> str:
    d = _cdict(elm)
    pr = d.get("dPr")
    beg = pr.get("begChr") if isinstance(pr, _Pr) else None
    end = pr.get("endChr") if isinstance(pr, _Pr) else None
    s_val = "(" if beg is None else beg
    e_val = ")" if end is None else end
    prefix = pr.text if isinstance(pr, _Pr) else ""
    return prefix + "\\left%s%s\\right%s" % (
        "." if not s_val else _escape_latex(s_val),
        d.get("e", ""),
        "." if not e_val else _escape_latex(e_val))


def _do_ssub(elm) -> str:
    d = _cdict(elm, ("e", "sub", "sSubPr"))
    base = str(d.get("e", "")).rstrip()
    if _needs_grouping(base):
        base = "{" + base + "}"
    return base + "_{%s}" % _unwrap_script(str(d.get("sub", "")), "_")


def _do_ssup(elm) -> str:
    d = _cdict(elm, ("e", "sup", "sSupPr"))
    base = str(d.get("e", "")).rstrip()
    if _needs_grouping(base):
        base = "{" + base + "}"
    return base + "^{%s}" % _unwrap_script(str(d.get("sup", "")), "^")


def _do_ssubsup(elm) -> str:
    d = _cdict(elm, ("e", "sub", "sup", "sSubSupPr"))
    base = str(d.get("e", "")).rstrip()
    if _needs_grouping(base):
        base = "{" + base + "}"
    return (base + "_{%s}" % _unwrap_script(str(d.get("sub", "")), "_")
            + "^{%s}" % _unwrap_script(str(d.get("sup", "")), "^"))


def _do_sub(elm) -> str:
    return "_{%s}" % _concat(elm)


def _do_sup(elm) -> str:
    return "^{%s}" % _concat(elm)


def _do_f(elm) -> str:
    d = _cdict(elm)
    pr = d.get("fPr")
    parts = {"num": d.get("num"), "den": d.get("den")}
    if not isinstance(pr, _Pr):
        return _FRAC_DEFAULT % parts
    tpl = _FRAC.get(pr.get("type"), _FRAC_DEFAULT)
    return pr.text + (tpl % parts)


def _do_func(elm) -> str:
    d = _cdict(elm)
    fname = str(d.get("fName", ""))
    return fname.replace(_FUNC_PLACE, str(d.get("e", "")))


def _do_fname(elm) -> str:
    parts = []
    for tag, val, _e in _children(elm):
        if tag == "r" and _FUNC.get(val):
            parts.append(_FUNC[val])
        elif isinstance(val, str):
            parts.append(val)
    t = "".join(parts)
    return t if _FUNC_PLACE in t else t + _FUNC_PLACE


def _do_groupchr(elm) -> str:
    d = _cdict(elm)
    pr = d.get("groupChrPr")
    chrv = pr.get("chr") if isinstance(pr, _Pr) else None
    tpl = (_ACCENTS.get(chrv, chrv) if chrv is not None
           else "\\underbrace{%s}")
    prefix = pr.text if isinstance(pr, _Pr) else ""
    return prefix + (tpl % (d.get("e", ""),) if "%s" in tpl else tpl)


def _do_rad(elm) -> str:
    d = _cdict(elm)
    if d.get("deg"):
        return "\\sqrt[%s]{%s}" % (d["deg"], d.get("e", ""))
    return "\\sqrt{%s}" % d.get("e", "")


def _do_eqarr(elm) -> str:
    return _BRK.join(str(v) for t, v, _e in _children(elm, ("e",)))


def _do_limlow(elm) -> str:
    d = _cdict(elm, ("e", "lim"))
    base = str(d.get("e", ""))
    lim = str(d.get("lim", ""))
    tpl = _LIM_FUNC.get(base)
    if tpl:
        return tpl % {"lim": lim}
    return f"{base}_{{{lim}}}"


def _do_limupp(elm) -> str:
    d = _cdict(elm, ("e", "lim"))
    return "\\overset{%s}{%s}" % (d.get("lim"), d.get("e"))


def _do_lim(elm) -> str:
    result = _concat(elm).replace("\\rightarrow", "\\to")
    result = result.rstrip()
    if result.endswith("\\\\"):
        result = result[:-2].rstrip()
    if result and not any(c in result for c in _MATH_CHARS):
        result = result.replace(" ", "\\ ")
    return result


def _do_m(elm) -> str:
    rows = [str(v) for t, v, _e in _children(elm) if t == "mr"]
    return "\\begin{matrix}%s\\end{matrix}" % _BRK.join(rows)


def _do_mr(elm) -> str:
    return "&".join(str(v) for t, v, _e in _children(elm, ("e",)))


def _do_nary(elm) -> str:
    bo = ""
    parts = []
    for tag, val, _e in _children(elm):
        if tag == "naryPr":
            chrv = val.get("chr") if isinstance(val, _Pr) else None
            bo = "\\int" if chrv is None else _NARY.get(chrv, chrv)
        else:
            parts.append(str(val))
    return bo + "".join(parts)


_DIRECT = ("box", "num", "den", "deg", "e")

_HANDLERS = {
    "acc": _do_acc, "r": _do_r, "bar": _do_bar, "sSub": _do_ssub,
    "sSup": _do_ssup, "sSubSup": _do_ssubsup, "sub": _do_sub,
    "sup": _do_sup, "f": _do_f, "func": _do_func, "fName": _do_fname,
    "groupChr": _do_groupchr, "d": _do_d, "rad": _do_rad,
    "eqArr": _do_eqarr, "limLow": _do_limlow, "limUpp": _do_limupp,
    "lim": _do_lim, "m": _do_m, "mr": _do_mr, "nary": _do_nary,
}


def _convert(elm, tag=None):
    if tag is None:
        tag = elm.tag.rsplit("}", 1)[-1]
    handler = _HANDLERS.get(tag)
    if handler is not None:
        return handler(elm)
    if tag in _DIRECT:
        return _concat(elm)
    if tag.endswith("Pr"):
        return _Pr(elm)
    return None


def omath_to_latex(omath: ET.Element) -> str:
    """Convert one ``m:oMath`` element to LaTeX (spacing squeezed once,
    like the reference's ``str(oMath2Latex(...))``)."""
    return _concat(omath).replace("  ", " ")
