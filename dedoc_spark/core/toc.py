"""Table-of-contents detection + TOC hierarchy builder.

Ports (rule-only, no model artifacts):
  - TocItem + filter_toc_line   feature_extractors/toc_feature_extractor.py:10-23
  - TOCFeatureExtractor.get_toc heuristic — probable-item regexp scan,
    window-5 mark smoothing, multiline merge, >6-items + monotone page
    order acceptance (toc_feature_extractor.py:36-155)
  - TocBuilder                  hierarchy_level_builders/toc_builder/toc_builder.py:10-34

Pure Python (no Spark, no numpy needed beyond lists — kept stdlib).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple, Union

from dedoc_spark.core.model import HierarchyLevel, Line

end_with_num = re.compile(r"(.*[^\s.…])?[….\s]+(\d{1,3})(-\d{1,3})?$")
WINDOW_SIZE = 5
TOC_TITLES = (
    "tableofcontents", "contents", "tableofcontentspage",  # english
    "содержание", "оглавление",  # russian
    "tabledesmatières", "tabledesmatieres", "sommaire",  # french
    "indice", "índice", "contenidos", "tabladecontenido",  # spanish
)


class TocItem:
    """'Method implementation......45' → TocItem(line='Method implementation', page=45)."""

    __slots__ = ("line", "page")

    def __init__(self, line: Line, page: int) -> None:
        self.line = line
        self.page = page

    def stripped_text(self) -> str:
        """filter_toc_line semantics (toc_feature_extractor.py:19-23):
        the item text without the page number and the "……" leader."""
        return self.line.line.strip("\n ").rstrip(str(self.page)).rstrip(". ")

    def filter_toc_line(self) -> "TocItem":
        # strip the page number and the "........" leader in place
        self.line.line = self.stripped_text()
        return self


def _concat(a: Line, b: Line) -> Line:
    """LineWithMeta.__add__ analogue — the model's annotation-aware concat
    (a NEW line; the originals stay untouched in the document)."""
    return a.concat(b)


def get_toc(document: Sequence[Line], by_tag: Optional[str] = None) -> List[TocItem]:
    """Heuristic TOC finder (toc_feature_extractor.py:36-67)."""
    if by_tag:
        return [
            TocItem(line=ln, page=ln.extras.get("tocitem_page", ln.page_id))
            for ln in document
            if ln.tag_hl is not None and ln.tag_hl.line_type == by_tag
        ]

    probable, marks = _probable_toc(document)
    if len(probable) <= WINDOW_SIZE:
        return []
    unmerged = _unmerged_toc(probable, marks)
    merged = _merged_multiline_toc(unmerged)
    if len(merged) > 6 and _page_order_ok(merged):
        return merged
    return []


def _probable_toc(document: Sequence[Line]) -> Tuple[List[Union[TocItem, Line]], List[bool]]:
    """First pass (toc_feature_extractor.py:102-132): regexp scan for the
    TOC title and page-numbered items."""
    lines_have_page_number: List[bool] = []
    probable: List[Union[TocItem, Line]] = []
    for line in document:
        line_text = line.line
        probable_title = re.sub(r"[\s:]", "", line_text).lower()
        if probable_title in TOC_TITLES and sum(lines_have_page_number) < 6:
            probable = []
            lines_have_page_number = []
            continue
        if not line_text.isspace() and not line_text.strip().isdigit():
            match = end_with_num.match(line_text.strip())
            if match:
                probable.append(TocItem(line=line, page=int(match.group(2))))
            else:
                probable.append(line)
            lines_have_page_number.append(bool(match))
    return probable, lines_have_page_number


def _unmerged_toc(
    lines: List[Union[TocItem, Line]], marks: List[bool]
) -> List[Union[TocItem, Line]]:
    """Window-5 mark smoothing (toc_feature_extractor.py:88-100) — same
    decisions, O(n): running prefix count replaces the per-iteration
    marks[:idx] slices (a 50k-line no-TOC document would otherwise cost
    ~n²/2 slice elements inside the executor)."""
    corrected: List[bool] = []
    n = len(lines)
    window_sum = sum(marks[:WINDOW_SIZE])  # marks[idx : idx+WINDOW_SIZE]
    prefix = 0  # sum(marks[:idx])
    for idx in range(n - WINDOW_SIZE):
        if prefix > 5 and window_sum == 0:
            corrected.extend([False] * (n - WINDOW_SIZE - idx))
            break
        marked_before = window_sum > 0 and prefix > 0
        marked_after = marks[idx] and (window_sum - (1 if marks[idx] else 0)) > 0
        corrected.append(marked_before or marked_after)
        prefix += 1 if marks[idx] else 0
        window_sum -= 1 if marks[idx] else 0
        if idx + WINDOW_SIZE < n:
            window_sum += 1 if marks[idx + WINDOW_SIZE] else 0
    corrected.extend([False] * WINDOW_SIZE)
    return [ln for ln, keep in zip(lines, corrected) if keep]


def _merged_multiline_toc(result: List[Union[TocItem, Line]]) -> List[TocItem]:
    """Multiline items: bare lines concatenate onto the next numbered item
    (toc_feature_extractor.py:69-86)."""
    merged: List[TocItem] = []
    cur_line: Optional[Line] = None
    for entry in result:
        if isinstance(entry, Line):
            cur_line = entry if cur_line is None else _concat(cur_line, entry)
        elif isinstance(entry, TocItem):
            cur = entry.line if cur_line is None else _concat(cur_line, entry.line)
            # the merged line keeps the FIRST component's line_id (concat
            # semantics); record the closing component's id so callers that
            # excise the TOC span (diploma _replace_toc_lines) can cover
            # the continuation lines too
            cur.extras["toc_span_last_id"] = entry.line.line_id
            merged.append(TocItem(line=cur, page=entry.page))
            cur_line = None
    return merged


def _page_order_ok(items: List[TocItem]) -> bool:
    """Pages must be non-decreasing (toc_feature_extractor.py:134-155)."""
    prev_page = int(items[0].page)
    for item in items[1:]:
        if int(item.page) < prev_page:
            return False
        prev_page = int(item.page)
    return True


def build_toc(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int) -> List[Line]:
    """TocBuilder port (toc_builder.py:11-34): the TOC title line (or a
    synthetic empty one) gets the 'toc' level, every item 'toc_item'."""
    result: List[Line] = []
    is_toc_begun = False
    for line, _label in lines_with_labels:
        if line.line.lower().strip() in TOC_TITLES:
            line.hl = HierarchyLevel(init_hl_depth + 0, 0, False, "toc")
            result.append(line)
            is_toc_begun = True
            continue
        if not is_toc_begun:
            synthetic = Line(
                line="",
                page_id=line.page_id,
                line_id=line.line_id,
                hl=HierarchyLevel(init_hl_depth + 0, 0, False, "toc"),
                uid=line.uid + "_toc",
            )
            result.append(synthetic)
        is_toc_begun = True
        line.hl = HierarchyLevel(init_hl_depth + 1, 0, False, "toc_item")
        result.append(line)
    return result
