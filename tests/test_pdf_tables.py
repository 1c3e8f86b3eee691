"""Ruled-table detection + table-region exclusion on the txt-layer path
(core/pdf_tables.py; reference contract pdf_txtlayer_reader.py:49-73)."""

import json

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.pdf_layout import BBox
from dedoc_spark.core.pdf_tables import (
    detect_ruled_tables,
    inside_any_unreadable_block,
)
from dedoc_spark.sources.pdf_fixture import build_pdf, table_ops

TABLE_PARAMS = {"need_pdf_table_analysis": True, "with_layout": True}


def _grid_segments(x, y, col_widths, row_height, n_rows):
    xs = [x]
    for w in col_widths:
        xs.append(xs[-1] + w)
    ys = [y + i * row_height for i in range(n_rows + 1)]
    segs = [(xs[0], yy, xs[-1], yy) for yy in ys]
    segs += [(xx, ys[0], xx, ys[-1]) for xx in xs]
    return segs


def _cells(d):
    return [
        ["\n".join(l["line"] for l in c["lines"]) for c in row]
        for row in json.loads(d["tables_json"])[0]["cells"]
    ]


def test_detect_grid_and_reject_plain_rectangle():
    grids = detect_ruled_tables(_grid_segments(72, 100, [100, 100], 20, 2))
    assert len(grids) == 1
    g = grids[0]
    assert g.n_rows == 2 and g.n_cols == 2
    assert (g.bbox.x_top_left, g.bbox.y_top_left) == (72, 100)
    # a plain rectangle (2 h + 2 v rules, no inner divider) is a border,
    # not a table — mirrors the recognizer's single-cell rejection
    rect = [(10, 10, 110, 10), (10, 50, 110, 50), (10, 10, 10, 50), (110, 10, 110, 50)]
    assert detect_ruled_tables(rect) == []


def test_detect_snaps_jittered_rules_and_splits_far_components():
    # two grids far apart → two components; 0.5pt jitter snaps
    segs = _grid_segments(72, 100, [60, 60], 20, 2) + _grid_segments(300, 500, [50, 50], 15, 1)
    segs = [(x0 + 0.4, y0, x1, y1) for x0, y0, x1, y1 in segs]
    grids = detect_ruled_tables(segs)
    assert len(grids) == 2
    assert grids[0].n_rows == 2 and grids[0].n_cols == 2
    assert grids[1].n_rows == 1 and grids[1].n_cols == 2


def test_single_column_rejected_unless_one_cell_table():
    """Heuristic 2 parity (onepage_table_extractor.py:103-105): a table
    must have more than one column; table_type "one_cell_table" waives
    it (and the plain-rectangle rejection) so 1×1 / N×1 grids return."""
    single_col = _grid_segments(72, 100, [100], 20, 2)  # 2 rows x 1 col
    assert detect_ruled_tables(single_col) == []
    grids = detect_ruled_tables(single_col, one_cell_table=True)
    assert len(grids) == 1 and grids[0].n_rows == 2 and grids[0].n_cols == 1
    plain_rect = _grid_segments(72, 100, [100], 20, 1)  # 1x1 border
    assert detect_ruled_tables(plain_rect) == []
    grids = detect_ruled_tables(plain_rect, one_cell_table=True)
    assert len(grids) == 1 and grids[0].n_rows == 1 and grids[0].n_cols == 1


def test_table_type_param_one_cell_table():
    """The table_type parameter reaches the detector through
    extract_document: a lone ruled rectangle around a text line becomes
    a 1x1 table (and the line leaves the flow) only with the option."""
    from dedoc_spark.sources.pdf_fixture import build_pdf, table_ops

    ops = table_ops(72, 700, [150], 20, [["only cell"]])
    payload = build_pdf([[("Body line", False)]], extra_content=[ops])
    d = extract_document("a.pdf", payload, None, params=TABLE_PARAMS)
    assert d["n_tables"] == 0
    assert "only cell" in d["text_extracted"]
    d = extract_document(
        "a.pdf", payload, None,
        params={**TABLE_PARAMS, "table_type": "one_cell_table"},
    )
    assert d["n_tables"] == 1
    assert _cells(d) == [["only cell"]]
    assert "only cell" not in d["text_extracted"]
    assert "Body line" in d["text_extracted"]


def test_inside_unreadable_block_threshold():
    block = BBox(100, 100, 200, 100)
    inside = BBox(110, 110, 50, 10)
    outside = BBox(10, 10, 50, 10)
    straddling_small = BBox(90, 110, 40, 10)  # 3/4 of its area inside
    straddling_edge = BBox(40, 110, 70, 10)  # 1/7 inside — below threshold
    assert inside_any_unreadable_block(inside, [block])
    assert not inside_any_unreadable_block(outside, [block])
    assert inside_any_unreadable_block(straddling_small, [block])
    assert not inside_any_unreadable_block(straddling_edge, [block])


def test_pdf_table_extracted_and_lines_excluded():
    ops = table_ops(72, 700, [100, 100], 20, [["id", "7"], ["src3", "en"]])
    pdf = build_pdf([[("Body line", False)]], extra_content=[ops])
    d = extract_document("t.pdf", pdf, None, params=TABLE_PARAMS)
    assert d["error"] is None
    assert d["n_tables"] == 1
    # table text leaves the page flow (unreadable-block exclusion)
    assert d["n_lines"] == 1
    assert d["text_extracted"] == "\nBody line\n"
    assert _cells(d) == [["id", "7"], ["src3", "en"]]
    # closest line carries the table annotation (line_object_linker)
    lines = json.loads(d["lines_json"])
    uid = json.loads(d["tables_json"])[0]["uid"]
    assert any(a["name"] == "table" and a["value"] == uid for a in lines[0]["annotations"])


def test_without_flag_bytes_unchanged():
    ops = table_ops(72, 700, [100, 100], 20, [["id", "7"], ["src3", "en"]])
    pdf = build_pdf([[("Body line", False)]], extra_content=[ops])
    d = extract_document("t.pdf", pdf, None)
    assert d["n_tables"] == 0
    assert d["n_lines"] == 3  # table text stays in the flow


def test_clip_rectangles_are_not_rules():
    # `re W n` defines a clip path, nothing is painted — must not detect
    clip = "72 600 200 100 re W n\n100 600 m 100 700 l S"
    pdf = build_pdf([[("Only text", False)]], extra_content=[clip])
    d = extract_document("t.pdf", pdf, None, params=TABLE_PARAMS)
    assert d["n_tables"] == 0 and d["n_lines"] == 1


def test_re_drawn_cells_form_grid():
    # a 2×1 grid drawn as two adjacent stroked rectangles (common writer
    # style) — shared edges snap into one boundary
    ops = (
        "72 650 100 20 re S\n172 650 100 20 re S\n"
        "BT /F1 10 Tf 1 0 0 1 80 655 Tm (left) Tj ET\n"
        "BT /F1 10 Tf 1 0 0 1 180 655 Tm (right) Tj ET"
    )
    pdf = build_pdf([[("Body", False)]], extra_content=[ops])
    d = extract_document("t.pdf", pdf, None, params=TABLE_PARAMS)
    assert d["n_tables"] == 1
    assert _cells(d) == [["left", "right"]]
    assert d["n_lines"] == 1


def test_multipage_ruled_table_merges():
    ops1 = table_ops(72, 700, [100, 100], 20, [["name", "value"], ["a", "1"]])
    ops2 = table_ops(72, 760, [100, 100], 20, [["name", "value"], ["b", "2"]])
    pdf = build_pdf(
        [[("Page one", False)], [("Page two", False)]], extra_content=[ops1, ops2]
    )
    d = extract_document("t.pdf", pdf, None, params=TABLE_PARAMS)
    # duplicated header dropped, continuation absorbed (multipage merge)
    assert d["n_tables"] == 1
    assert _cells(d) == [["name", "value"], ["a", "1"], ["b", "2"]]


def test_different_width_tables_stay_separate():
    ops1 = table_ops(72, 700, [100, 100], 20, [["name", "value"], ["a", "1"]])
    ops2 = table_ops(72, 760, [150, 150], 20, [["name", "value"], ["b", "2"]])
    pdf = build_pdf(
        [[("Page one", False)], [("Page two", False)]], extra_content=[ops1, ops2]
    )
    d = extract_document("t.pdf", pdf, None, params=TABLE_PARAMS)
    assert d["n_tables"] == 2


def test_vector_art_page_capped():
    """A plot-like page painting thousands of strokes is not a table —
    detection degrades to none instead of an O(n²) union-find blow-up."""
    from dedoc_spark.core.pdf_tables import MAX_SEGMENTS

    segs = [(float(i % 500), float(i % 311), float(i % 500) + 8.0, float(i % 311)) for i in range(MAX_SEGMENTS + 1)]
    assert detect_ruled_tables(segs) == []


def test_double_stroked_rectangle_rejected():
    """A plain rectangle whose top edge is double-stroked (3 raw h-segments
    snapping to 2 boundaries) is still a border, not a 1×1 table — the
    inner-divider check holds on the SNAPPED bounds."""
    rect = [
        (10, 10.0, 110, 10.0),
        (10, 10.5, 110, 10.5),  # double stroke of the top edge
        (10, 50, 110, 50),
        (10, 10, 10, 50),
        (110, 10, 110, 50),
    ]
    assert detect_ruled_tables(rect) == []


# ---------------------------------------------------------------------------
# GOST frame analysis on the txt-layer path (gost_frame_recognizer.py:20-44
# + pdf_txtlayer_reader.py:63-70 semantics, content-stream port)


def _framed_payload(with_table=True, stamp="Sheet 9"):
    from dedoc_spark.sources.pdf_fixture import gost_frame_ops

    ops = gost_frame_ops(stamp)
    if with_table:
        ops += "\n" + table_ops(72, 700, [100, 100], 20, [["id", "9"], ["a", "b"]])
    return build_pdf([[("Body line", False)]], extra_content=[ops])


def test_gost_frame_detected_from_rules():
    from dedoc_spark.core.pdf_tables import detect_gost_frame

    # outer 10..602 × 10..782, content 40..597 × 15..672 (top-down)
    segs = []
    for x0, y0, x1, y1 in [(10, 10, 602, 10), (10, 782, 602, 782),
                           (10, 10, 10, 782), (602, 10, 602, 782),
                           (40, 15, 597, 15), (40, 672, 597, 672),
                           (40, 15, 40, 672), (597, 15, 597, 672)]:
        segs.append((float(x0), float(y0), float(x1), float(y1)))
    box = detect_gost_frame(segs, 612, 792)
    assert box is not None
    assert abs(box.x_top_left - 40) < 1 and abs(box.y_top_left - 15) < 1
    assert abs(box.x_bottom_right - 597) < 1 and abs(box.y_bottom_right - 672) < 1


def test_gost_frame_requires_nesting_and_area():
    from dedoc_spark.core.pdf_tables import detect_gost_frame

    # single rectangle: no outer contour to be a child of → no frame
    segs = [(40.0, 15.0, 597.0, 15.0), (40.0, 672.0, 597.0, 672.0),
            (40.0, 15.0, 40.0, 672.0), (597.0, 15.0, 597.0, 672.0)]
    assert detect_gost_frame(segs, 612, 792) is None
    # nested but tiny content (< 0.65 of the page) → no frame
    segs += [(200.0, 200.0, 590.0, 200.0), (200.0, 600.0, 590.0, 600.0),
             (200.0, 200.0, 200.0, 600.0), (590.0, 200.0, 590.0, 600.0)]
    assert detect_gost_frame(segs, 612, 792) is None


def test_gost_param_drops_title_block_text():
    payload = _framed_payload(with_table=False)
    d_off = extract_document("a.pdf", payload, None)
    d_on = extract_document(
        "a.pdf", payload, None, params={"need_gost_frame_analysis": True}
    )
    assert "Sheet 9" in d_off["text_extracted"]
    assert "Body line" in d_on["text_extracted"]
    assert "Sheet 9" not in d_on["text_extracted"]


def test_gost_with_tables_frame_is_not_a_table():
    payload = _framed_payload()
    d = extract_document(
        "a.pdf", payload, None,
        params={"need_gost_frame_analysis": True, **TABLE_PARAMS},
    )
    assert d["n_tables"] == 1
    assert _cells(d) == [["id", "9"], ["a", "b"]]
    # body stays in flow; stamp and captured cell text do not
    assert "Body line" in d["text_extracted"]
    assert "Sheet 9" not in d["text_extracted"]
    assert "id" not in d["text_extracted"]


def test_gost_default_bytes_unchanged():
    # the param is opt-in: a frameless doc parses identically with it on
    payload = build_pdf([[("Doc X", True), ("plain", False)]])
    d_off = extract_document("a.pdf", payload, None)
    d_on = extract_document(
        "a.pdf", payload, None, params={"need_gost_frame_analysis": True}
    )
    assert d_on["text_extracted"] == d_off["text_extracted"]
