"""Behavioral vectors lifted from the reference's unit tests
(``tests/test_backend_html.py``; FIXTURES.md §3): small HTML -> exact md."""

import pytest

from docling_spark.extractor import extract
from docling_spark.serialize import to_markdown


def md(html: str) -> str:
    return to_markdown(extract(html.encode(), name="unit"))


# ordered-list `start` semantics (reference tests :171-225)
@pytest.mark.parametrize("start,expected_first", [
    ("42", "42. a"),
    ("1", "1. a"),
    ("0", "0. a"),
])
def test_ol_start_numeric(start, expected_first):
    out = md(f'<ol start="{start}"><li>a</li><li>b</li></ol>')
    assert out.splitlines()[0] == expected_first


def test_ol_start_non_numeric_falls_back():
    out = md('<ol start="x"><li>a</li><li>b</li></ol>')
    assert out.splitlines()[0] == "1. a"


def test_ol_start_negative_falls_back():
    # "-5".isnumeric() is False -> treated as no start
    out = md('<ol start="-5"><li>a</li><li>b</li></ol>')
    assert out.splitlines()[0] == "1. a"


# <br> semantics (reference tests :1286-1432)
def test_single_br_newline_in_paragraph():
    assert md("<p>line one<br>line two</p>") == "line one\nline two"


def test_double_br_paragraph_split():
    assert md("<p>one<br><br>two</p>") == "one\n\ntwo"


def test_pre_keeps_newlines():
    out = md("<pre>a\nb</pre>")
    assert out == "```\na\nb\n```"


# paragraph repair (reference tests :806-838)
def test_heading_inside_p_promoted():
    # browser-style repair splits the <p>; "before" precedes the first
    # heading so it lands in the furniture layer (excluded from body md)
    out = md("<p>before<h2>Head</h2>after</p>")
    assert "## Head" in out
    assert "before" not in out
    assert out.index("## Head") < out.index("after")


def test_list_inside_p_promoted():
    out = md("<p>intro<ul><li>x</li></ul>tail</p>")
    assert "- x" in out


# furniture layering (reference tests :553-580)
def test_content_before_first_heading_is_furniture():
    out = md("<body><p>furniture text</p><h1>Title</h1><p>body text</p></body>")
    assert "furniture text" not in out
    assert out.startswith("# Title")


def test_footer_excluded_from_body_export():
    out = md("<body><h1>T</h1><p>keep</p><footer><p>drop</p></footer></body>")
    assert "drop" not in out


# description lists (reference tests :313-373)
def test_dl_dt_bold_dd_nested():
    out = md("<dl><dt>Term</dt><dd>Definition</dd></dl>")
    lines = out.splitlines()
    assert lines[0] == "- **Term**"
    assert lines[1] == "    - Definition"


def test_orphan_dd_without_dt():
    out = md("<dl><dd>lonely</dd></dl>")
    assert "- lonely" in out


# heading level bridging (reference tests :144-168)
def test_heading_level_jump_bridged():
    out = md("<h1>A</h1><h4>Deep</h4><p>x</p>")
    assert "### Deep" in out  # h4 -> level 3 -> ### (level+1 hashes)


def test_unicode_cleanup_table():
    out = md("<p>a b—c’d…e​f</p>")
    assert out == "a b-c'd...ef"


def test_inline_code_and_formatting():
    out = md("<p>mix <code>c()</code> and <b>bold</b> text</p>")
    assert out == "mix `c()` and **bold** text"


def test_hyperlink_inheritance():
    out = md('<p><a href="/x"><span>inner</span></a></p>')
    assert out == "[inner](/x)"


def test_table_with_spans():
    out = md('<table><tr><th>H1</th><th>H2</th></tr>'
             '<tr><td colspan="2">wide</td></tr></table>')
    lines = out.splitlines()
    assert lines[0] == "| H1 | H2 |"
    assert lines[2] == "| wide | wide |"


def test_is_rich_table_cell_grid():
    """Hand-labeled rich-cell classification grid from the reference's
    tests/test_backend_html.py:682-760."""
    import pathlib

    from docling_spark.dom import parse_html
    from docling_spark.extractor import HtmlExtractor

    raw = pathlib.Path(
        "/root/reference/tests/data/html/sources/html_rich_table_cells.html"
    ).read_bytes()
    dom = parse_html(raw)
    ex = HtmlExtractor()
    ex.doc = None  # predicate path does not touch the doc

    gt = {
        0: [False, False, False, False, False, False, False, False, False,
            False, False, True, False, True, True],
        1: [False, False, True, False, True, False, True, False],
        2: [False, True, True, True, False, True, True],
        3: [False, False, False, False, False, False],
        4: [False, False, False, False, False, True, False, False, True,
            False, False, True, False, False, False],
    }
    for idx_t, table in enumerate(dom.find_all("table")):
        expected = iter(gt[idx_t])
        n = 0
        for part in table.find_all(["thead", "tbody"], recursive=False):
            for row in part.find_all("tr", recursive=False):
                for cell in row.find_all(["td", "th"], recursive=False):
                    assert next(expected) == ex._is_rich_table_cell(cell), \
                        f"table {idx_t} cell {n}"
                    n += 1
        assert n == len(gt[idx_t])
