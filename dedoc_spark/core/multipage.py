"""Multipage table merge — faithful port of the reference's
MultiPageTableExtractor (pdf_image_reader/table_recognizer/table_extractors/
concrete_extractors/multipage_table_extractor.py:18-180) over located
tables, plus the header-equality helper from table_attribute_extractor.py.

A table continues onto the next page iff (semantics preserved exactly):
  1. bbox widths equal within ±3% of the first width
     (`__is_one_table` cond 1, eps = int(width1 * 0.03));
  2. a duplicated header (difflib similarity ≥ 0.8 per cell, same shape)
     on the continuation is dropped before the remaining checks;
  3. column counts of t1's last row and t2's first row are equal;
  4. per-cell widths of the boundary rows equal within max(4, 10%) —
     only when cells carry bboxes (`check_on_cell_instance`).

The page-walk control flow (only the LAST table of a page can extend onto
the FIRST table of the following page; merging stops when the page holds
further tables) is ported line-for-line, including the `cur_page`
back-step. `delete_ref_table` removes the merged table's "table"
annotation from the first line that carries it.

The Spark-scale relational form lives in operators/tables.py.
"""

from __future__ import annotations

import difflib
from typing import List, Optional

from dedoc_spark.core.model import Cell, Line
from dedoc_spark.core.pdf_layout import Location


def equal_with_eps(x: float, y: float, eps: float = 10) -> bool:
    return y + eps >= x >= y - eps


def _similarity(s1: str, s2: str) -> float:
    return difflib.SequenceMatcher(None, s1.lower(), s2.lower()).ratio()


class LocatedTable:
    """ScanTable analogue: rectangular cells + one Location per merged page
    part (scantable.py:13-26)."""

    __slots__ = ("cells", "locations", "uid", "order")

    def __init__(
        self, cells: List[List[Cell]], location: Location, uid: str = "", order: int = -1
    ) -> None:
        self.cells = cells
        self.locations = [location]
        self.uid = uid
        self.order = order

    @property
    def location(self) -> Location:
        return self.locations[0]

    def extended(self, table: "LocatedTable") -> None:
        self.locations.extend(table.locations)
        self.cells.extend(table.cells)
        self.order = max(self.order, table.order)


def get_header_table(cells: List[List[Cell]]) -> List[List[Cell]]:
    """First row as the header when cells carry no is_attribute marks
    (table_attribute_extractor.py:44-57 fallback branch — our Cell model
    has no attribute flags, same as a ScanTable built from plain cells)."""
    return cells[:1]


def is_equal_header(
    header_1: List[List[Cell]], header_2: List[List[Cell]], thr_similarity: float = 0.8
) -> bool:
    if len(header_1) != len(header_2):
        return False
    for i in range(len(header_1)):
        if len(header_1[i]) != len(header_2[i]):
            return False
        for j in range(len(header_1[i])):
            if _similarity(header_1[i][j].get_text(), header_2[i][j].get_text()) < thr_similarity:
                return False
    return True


def _cells_have_bboxes(cells: List[List[Cell]]) -> bool:
    """check_on_cell_instance analogue: condition 4 only applies when cells
    carry geometry (scantable.py:27-34 checks the pdf Cell class, whose
    distinguishing feature is the bbox)."""
    if not cells or not cells[0]:
        return False
    return getattr(cells[0][0], "bbox", None) is not None


def _width_cells_wo_separating(row: List[Cell]) -> List[float]:
    """Per-cell widths collapsing horizontally merged runs (same uid):
    multipage_table_extractor.py:108-124."""
    widths: List[float] = []
    prev_uid = None
    start = end = 0.0
    for cell_id, cell in enumerate(row):
        bbox = cell.bbox  # type: ignore[attr-defined]
        uid = getattr(cell, "uuid", id(cell))
        if prev_uid is None:
            start = bbox.x_top_left
            prev_uid = uid
        elif prev_uid != uid:
            widths.append(end - start)
            start = bbox.x_top_left
        end = bbox.x_bottom_right
        if cell_id == len(row) - 1:
            widths.append(end - start)
    return widths


def _is_equal_width_cells(part_1: List[List[Cell]], part_2: List[List[Cell]]) -> bool:
    w1 = _width_cells_wo_separating(part_1[-1])
    w2 = _width_cells_wo_separating(part_2[0])
    for i in range(len(w1)):
        eps = max(4, int(w1[i] * 0.1))
        if len(w2) <= i or not equal_with_eps(w1[i], w2[i], eps):
            return False
    return True


def _is_one_table(t1: LocatedTable, t2: LocatedTable) -> bool:
    # cond 1: equal table widths (±3% of width1)
    width1 = abs(t1.locations[-1].bbox.width)
    width2 = abs(t2.locations[0].bbox.width)
    if not equal_with_eps(width1, width2, int(width1 * 0.03)):
        return False
    # cond 2: drop a duplicated header from the continuation
    attr1 = get_header_table(t1.cells)
    attr2 = get_header_table(t2.cells)
    cells2 = t2.cells
    if is_equal_header(attr1, attr2):
        cells2 = cells2[len(attr2):]
    if len(cells2) == 0 or len(t1.cells) == 0:
        return False
    # cond 3: equal column counts at the boundary
    if len(t1.cells[-1]) != len(cells2[0]):
        return False
    # cond 4: equal per-cell widths at the boundary (geometry-bearing cells)
    if (
        _cells_have_bboxes(t1.cells)
        and _cells_have_bboxes(cells2)
        and not _is_equal_width_cells(t1.cells, cells2)
    ):
        return False
    t2.cells = cells2  # save the header-dedup
    return True


def _delete_ref_table(lines: List[Line], table_uid: str) -> None:
    for line in lines:
        for num, ann in enumerate(line.annotations):
            if ann.name == "table" and ann.value == table_uid:
                line.annotations.pop(num)
                return


def extract_multipage_tables(
    single_tables: List[LocatedTable], lines_with_meta: Optional[List[Line]] = None
) -> List[LocatedTable]:
    """Merge page-adjacent continuations; the control flow is the
    reference's page walk verbatim (multipage_table_extractor.py:21-105)."""
    lines_with_meta = lines_with_meta if lines_with_meta is not None else []
    multipages_tables: List[LocatedTable] = []
    total_pages = max((t.location.page_number + 1 for t in single_tables), default=0)
    list_page_with_tables: List[List[LocatedTable]] = []
    for cur_page in range(total_pages):
        list_page_with_tables.append(
            [t for t in single_tables if t.location.page_number == cur_page]
        )

    if total_pages == 1:
        for tbls in list_page_with_tables:
            multipages_tables.extend(tbls)
        return multipages_tables

    total_cur_page = 0
    while total_cur_page < total_pages:
        begin_page = total_cur_page
        if len(list_page_with_tables[begin_page]) == 0:
            total_cur_page += 1
            continue
        t1 = list_page_with_tables[begin_page][-1]
        cur_page = _handle_multipage_table(
            begin_page + 1, lines_with_meta, list_page_with_tables, t1, total_pages
        )
        total_cur_page = cur_page + 1
        multipages_tables.extend(list_page_with_tables[begin_page][:-1])
        multipages_tables.append(t1)
        list_page_with_tables[begin_page] = []
        for page in range(begin_page + 1, min(cur_page + 1, total_pages)):
            if len(list_page_with_tables[page]) > 0:
                multipages_tables.extend(list_page_with_tables[page])
                list_page_with_tables[page] = []
    return multipages_tables


def _handle_multipage_table(
    cur_page: int,
    lines_with_meta: List[Line],
    list_page_with_tables: List[List[LocatedTable]],
    t1: LocatedTable,
    total_pages: int,
) -> int:
    finish = False
    while not finish:
        if cur_page == total_pages:
            finish = True
            continue
        if len(list_page_with_tables[cur_page]) == 0:
            finish = True
            continue
        t2 = list_page_with_tables[cur_page][0]
        if _is_one_table(t1, t2):
            t1.extended(t2)
            list_page_with_tables[cur_page].pop(0)
            _delete_ref_table(lines_with_meta, t2.uid)
        else:
            if len(list_page_with_tables[cur_page]) > 0:
                cur_page -= 1
            finish = True
            continue
        if not finish:
            if len(list_page_with_tables[cur_page]) > 0:
                cur_page -= 1
                finish = True
            else:
                cur_page += 1
    return cur_page
