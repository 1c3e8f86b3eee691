"""Multipage table merge tests — core port parity (multipage_table_extractor.py)
and the relational Spark form (operators/tables.py)."""

from dedoc_spark.core.model import Annotation, Cell, Line
from dedoc_spark.core.multipage import (
    LocatedTable,
    extract_multipage_tables,
    is_equal_header,
)
from dedoc_spark.core.pdf_layout import BBox, Location


def _cells(rows):
    return [[Cell(lines=[Line(line=v)]) for v in row] for row in rows]


def _table(rows, page, width, uid, x=0.0, y=0.0):
    return LocatedTable(_cells(rows), Location(page, BBox(x, y, width, 50.0)), uid=uid)


def _texts(table):
    return [[c.get_text() for c in row] for row in table.cells]


def test_merge_two_pages_with_header_dedup():
    t1 = _table([["Name", "Cost"], ["a", "1"]], 0, 100, "t1")
    t2 = _table([["name", "cost"], ["b", "2"]], 1, 101, "t2")  # difflib ≥ 0.8
    lines = [Line(line="cap", annotations=[Annotation(0, 3, "table", "t2")])]
    out = extract_multipage_tables([t1, t2], lines)
    assert len(out) == 1
    assert _texts(out[0]) == [["Name", "Cost"], ["a", "1"], ["b", "2"]]
    assert len(out[0].locations) == 2
    assert lines[0].annotations == []  # merged table's annotation removed


def test_merge_without_repeated_header_keeps_rows():
    t1 = _table([["Name", "Cost"], ["a", "1"]], 0, 100, "t1")
    t2 = _table([["b", "2"], ["c", "3"]], 1, 100, "t2")
    out = extract_multipage_tables([t1, t2], [])
    assert len(out) == 1
    assert _texts(out[0]) == [["Name", "Cost"], ["a", "1"], ["b", "2"], ["c", "3"]]


def test_no_merge_on_width_mismatch():
    t1 = _table([["a", "b"]], 0, 100, "t1")
    t2 = _table([["c", "d"]], 1, 200, "t2")  # eps = int(100*0.03) = 3
    out = extract_multipage_tables([t1, t2], [])
    assert len(out) == 2


def test_no_merge_on_column_count_mismatch():
    t1 = _table([["a", "b"]], 0, 100, "t1")
    t2 = _table([["c", "d", "e"]], 1, 100, "t2")
    out = extract_multipage_tables([t1, t2], [])
    assert len(out) == 2


def test_chain_across_three_pages():
    t1 = _table([["H", "H2"], ["a", "1"]], 0, 100, "t1")
    t2 = _table([["b", "2"]], 1, 100, "t2")
    t3 = _table([["c", "3"]], 2, 102, "t3")  # vs t2's width 100: eps 3 ✓
    out = extract_multipage_tables([t1, t2, t3], [])
    assert len(out) == 1
    assert _texts(out[0]) == [["H", "H2"], ["a", "1"], ["b", "2"], ["c", "3"]]
    assert len(out[0].locations) == 3


def test_second_table_on_page_stops_chain():
    """After merging the first table of a page, remaining tables on that
    page end the chain (multipage_table_extractor.py:96-101)."""
    t1 = _table([["a", "b"]], 0, 100, "t1")
    t2 = _table([["c", "d"]], 1, 100, "t2")
    t2b = _table([["e", "f"]], 1, 100, "t2b")
    t3 = _table([["g", "h"]], 2, 100, "t3")
    out = extract_multipage_tables([t1, t2, t2b, t3], [])
    # t1+t2 merge; t2b is its own table; t2b (last on page 1) then chains
    # with t3 in the next outer-loop round
    merged = sorted((_texts(t) for t in out), key=len, reverse=True)
    assert len(out) == 2
    assert merged[0] == [["a", "b"], ["c", "d"]]
    assert merged[1] == [["e", "f"], ["g", "h"]]


def test_header_similarity_threshold():
    h1 = _cells([["Name", "Cost"]])
    assert is_equal_header(h1, _cells([["name", "cost"]]))
    assert not is_equal_header(h1, _cells([["Qty", "Sum"]]))
    assert not is_equal_header(h1, _cells([["Name"]]))


def test_relational_form_matches_core_semantics(spark):
    """operators/tables.py window form: same chains on the q42 layout."""
    from dedoc_spark.operators.tables import merge_multipage_tables_df

    rows = [
        ("u1", 0, 0, 2, 100.0, [["h1", "h2"], ["a", "1"]]),
        ("u1", 1, 0, 2, 101.0, [["h1", "h2"], ["b", "2"]]),  # cont + header dup
        ("u1", 1, 1, 3, 100.0, [["x", "y", "z"]]),  # new chain (3 cols)
        ("u1", 2, 0, 3, 200.0, [["p", "q", "r"]]),  # new chain (width)
        ("u2", 0, 0, 2, 100.0, [["h", "h"], ["c", "3"]]),  # other url untouched
    ]
    df = spark.createDataFrame(
        rows,
        "url string, page_id int, table_seq int, n_cols int, width double, "
        "rows array<array<string>>",
    )
    out = {
        (r.url, r.chain_id): r for r in merge_multipage_tables_df(df).collect()
    }
    assert len(out) == 4
    c1 = out[("u1", 1)]
    assert c1.n_parts == 2 and (c1.page_lo, c1.page_hi) == (0, 1)
    assert c1.rows == [["h1", "h2"], ["a", "1"], ["b", "2"]]
    assert out[("u1", 2)].rows == [["x", "y", "z"]]
    assert out[("u1", 3)].rows == [["p", "q", "r"]]
    assert out[("u2", 1)].n_parts == 1
