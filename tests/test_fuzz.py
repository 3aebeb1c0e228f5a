"""Property tests: the extraction function is total (never raises) and
deterministic over arbitrary byte inputs - the Spark UDF contract."""

from hypothesis import given, settings, strategies as st

from docling_spark.extractor import extract
from docling_spark.formats import (
    convert_asciidoc,
    convert_csv,
    convert_markdown,
    convert_vtt,
)
from docling_spark.serialize import to_indented_text, to_json, to_markdown

# Tag soup: fragments that stress the parser state machine
_FRAGMENTS = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<li>", "<table>", "<tr>", "<td>",
    "<b>", "<a href='x'>", "<br>", "<h1>", "<h2>", "</h3>", "<pre>",
    "<ul>", "<ol start='3'>", "<dl>", "<dt>", "<dd>", "<img alt='i'>",
    "<input type='checkbox'>", "<form_region>", "<!-- c -->", "&amp;",
    "&#65;", "text", " ", "\n", "­x", "•", "—", "", "<footer>",
    "<span id='key1'>", "<span id='key1_value1'>", "hidden='true'",
])


@given(st.lists(_FRAGMENTS, max_size=40).map("".join))
@settings(max_examples=200, deadline=None)
def test_html_extract_total_and_deterministic(soup):
    doc1 = extract(soup.encode(), name="fuzz")
    out1 = (to_markdown(doc1), to_indented_text(doc1), to_json(doc1))
    doc2 = extract(soup.encode(), name="fuzz")
    out2 = (to_markdown(doc2), to_indented_text(doc2), to_json(doc2))
    assert out1 == out2


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_all_backends_total_on_arbitrary_bytes(raw):
    for conv in (extract, convert_markdown, convert_csv, convert_vtt,
                 convert_asciidoc):
        doc = conv(raw, name="fuzz")
        to_markdown(doc)


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_markdown_backend_total_on_text(text):
    doc = convert_markdown(text.encode(), name="fuzz")
    to_markdown(doc)
    to_indented_text(doc)
    to_json(doc)
