"""Deterministic PDF-stage operators: postprocessing, reading order,
sanitation, quality scoring (reference semantics per SURVEY §2.B)."""

import json
import math

from docling_spark.layout import (
    BBox,
    Cell,
    Cluster,
    assemble_page,
    attach_captions,
    page_parse_score,
    postprocess_page,
    process_page_layout,
    rate_text_quality,
    reading_order,
    sanitize_text,
)


def _cell(i, text, l, t, r, b):
    return Cell(i, text, BBox(l, t, r, b))


def _cluster(i, label, l, t, r, b, conf=0.9):
    return Cluster(i, label, BBox(l, t, r, b), conf)


# ---------------------------------------------------------- text quality

def test_quality_garbage_patterns():
    assert rate_text_quality("GLYPH<0041>x") == 0.0
    assert rate_text_quality("/G12/G34 junk") == 0.0
    assert rate_text_quality("bad \ufffd char") == 0.0
    assert rate_text_quality("normal sentence here") == 1.0


def test_parse_score_quantile():
    texts = ["ok"] * 9 + ["GLYPH<00>"]
    s = page_parse_score(texts)
    assert 0.0 <= s < 1.0  # the bad cell dominates the 10% quantile
    assert math.isnan(page_parse_score([]))


# ------------------------------------------------------------ postprocess

def test_confidence_filter_and_remap():
    cells = [_cell(0, "hello", 0, 0, 10, 5)]
    clusters = [
        _cluster(1, "text", 0, 0, 10, 5, conf=0.9),
        _cluster(2, "text", 20, 20, 30, 25, conf=0.2),   # below threshold
        _cluster(3, "title", 0, 10, 10, 15, conf=0.9),   # remapped
    ]
    cells.append(_cell(1, "heading", 0, 10, 10, 15))
    out = postprocess_page(cells, clusters, 100, 100)
    labels = {c.id: c.label for c in out}
    assert 2 not in labels
    assert labels[3] == "section_header"


def test_cell_assignment_best_overlap():
    cells = [_cell(0, "in A", 1, 1, 9, 4), _cell(1, "in B", 1, 11, 9, 14)]
    clusters = [_cluster(1, "text", 0, 0, 10, 5),
                _cluster(2, "text", 0, 10, 10, 15)]
    out = postprocess_page(cells, clusters, 100, 100)
    by_id = {c.id: [cell.text for cell in c.cells] for c in out}
    assert by_id[1] == ["in A"] and by_id[2] == ["in B"]


def test_orphan_cells_become_text_clusters():
    cells = [_cell(0, "orphan far away", 50, 50, 60, 55)]
    clusters = [_cluster(1, "text", 0, 0, 10, 5)]
    out = postprocess_page(cells, clusters, 100, 100)
    orphans = [c for c in out if c.cells and c.cells[0].text.startswith("orphan")]
    assert len(orphans) == 1
    assert orphans[0].label == "text"


def test_overlap_dedup_merges_duplicates():
    cells = [_cell(0, "dup text", 0, 0, 10, 5)]
    clusters = [_cluster(1, "text", 0, 0, 10, 5, conf=0.9),
                _cluster(2, "text", 0.2, 0.2, 10, 5, conf=0.6)]
    out = postprocess_page(cells, clusters, 100, 100)
    assert len(out) == 1


def test_full_page_picture_dropped():
    clusters = [_cluster(1, "picture", 0, 0, 99, 99, conf=0.9)]
    out = postprocess_page([], clusters, 100, 100)
    assert out == []


def test_empty_clusters_removed_but_formula_kept():
    clusters = [_cluster(1, "text", 0, 0, 10, 5, conf=0.9),
                _cluster(2, "formula", 20, 20, 30, 25, conf=0.9)]
    out = postprocess_page([], clusters, 100, 100)
    assert [c.label for c in out] == ["formula"]


# ---------------------------------------------------------- reading order

def test_reading_order_single_column():
    clusters = [_cluster(1, "text", 0, 50, 100, 60),
                _cluster(2, "text", 0, 0, 100, 10),
                _cluster(3, "text", 0, 25, 100, 35)]
    assert [c.id for c in reading_order(clusters)] == [2, 3, 1]


def test_reading_order_two_columns():
    # left column fully read before right column within the same band
    clusters = [
        _cluster(1, "text", 55, 0, 100, 30),   # right top
        _cluster(2, "text", 0, 0, 45, 30),     # left top
        _cluster(3, "text", 0, 35, 45, 60),    # left bottom
        _cluster(4, "text", 55, 35, 100, 60),  # right bottom
    ]
    order = [c.id for c in reading_order(clusters)]
    assert order.index(2) < order.index(1)
    assert order.index(2) < order.index(3)


def test_caption_attachment():
    clusters = [_cluster(1, "picture", 0, 0, 50, 40),
                _cluster(2, "caption", 0, 42, 50, 50),
                _cluster(3, "caption", 200, 42, 250, 50)]  # no x-overlap
    att = attach_captions(clusters)
    assert att == {2: 1}


# ------------------------------------------------------------- sanitation

def test_hyphen_debreak():
    assert sanitize_text(["informa-", "tion theory"]) == "information theory"


def test_hyphen_strip_follows_word_regex_semantics():
    # reference checks the LAST WORD of the previous line (not adjacency),
    # so "3" + "here" still triggers the de-break and drops the hyphen
    assert sanitize_text(["see fig. 3 -", "- here"]) == "see fig. 3 - here"
    # the rule keys on the last/first WORDS of the lines, wherever they
    # sit - "x" and "y" are alnum, so the hyphen is dropped even here
    assert sanitize_text(["x !-", "? y"]) == "x !? y"
    # no word at all on one side -> hyphen kept; hyphen-terminated lines
    # never get a joining space in the reference
    assert sanitize_text(["--", "? y"]) == "--? y"


def test_ligature_expansion_and_quotes():
    assert sanitize_text(["ﬁeld “x” • done"]) == "field 'x' · done"
    assert sanitize_text(["ﬁ eld"]) == "field"  # spurious space absorbed


# --------------------------------------------------------- spark operator

def test_process_page_layout_spark(spark):
    cells = [{"index": 0, "text": "Title text", "l": 10, "t": 5,
              "r": 90, "b": 12},
             {"index": 1, "text": "Body para-", "l": 10, "t": 20,
              "r": 90, "b": 28},
             {"index": 2, "text": "graph joined", "l": 10, "t": 30,
              "r": 90, "b": 38}]
    clusters = [{"id": 1, "label": "section_header", "l": 8, "t": 4,
                 "r": 92, "b": 13, "confidence": 0.95},
                {"id": 2, "label": "text", "l": 8, "t": 18, "r": 92,
                 "b": 40, "confidence": 0.9}]
    df = spark.createDataFrame(
        [("u://doc", 1, 100.0, 200.0, json.dumps(cells),
          json.dumps(clusters))],
        "url string, page_no int, page_width double, page_height double, "
        "cells string, clusters string")
    row = process_page_layout(df).collect()[0]
    assert row["parse_score"] == 1.0
    labels = [e["label"] for e in row["elements"]]
    assert labels == ["section_header", "text"]
    # hyphen de-break applied across the two body cells
    assert row["elements"][1]["text"] == "Body paragraph joined"


def test_merge_split_text_reference_vectors():
    """Vectors from the reference's test_readingorder_hyphenated_merges."""
    from docling_spark.layout import merge_split_text
    assert merge_split_text("algo-", "rithms") == "algorithms"
    assert merge_split_text("algo­", "rithms") == "algorithms"
    assert merge_split_text("algo-", "Rithms") == "algo- Rithms"
