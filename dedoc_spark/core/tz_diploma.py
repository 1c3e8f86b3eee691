"""TZ (technical-task) and diploma structure extractors — rule-based parts.

Ports:
  - TZ zone machine + builders   tz_structure_extractor.py:35-77,
                                 tz_builder/body_builder.py:15-67
  - named-item regexp            tz_feature_extractor.py:19
  - bullet prefix regexp         list_features/prefix/bullet_prefix.py:20
  - diploma extractor            diploma_structure_extractor.py:38-141
                                 (toc replacement, footnote merging,
                                 page-number line typing, body builder
                                 diploma_builder/body_builder.py:15-91)
  - diploma pattern composition  structure_extractors/patterns/* regex
                                 semantics expressed with the repo's own
                                 structure regexes (same prefix classes:
                                 dotted / bracket / letter / bullet)

The reference's Tz/Diploma XGBoost line classifiers are internal model
artifacts (same scope decision as the law family, core/law_structure.py):
``predict_tz_labels`` / ``predict_diploma_labels`` are documented
deterministic regex stand-ins built from the classifiers' own feature
regexps, and callers can pass explicit ``labels`` to swap in a trained
model. TOC heuristics are shared with core/toc.py.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from dedoc_spark.core.law_structure import (
    regexps_ends_of_number,
    regexps_number,
    regexps_subitem,
)
from dedoc_spark.core.model import HierarchyLevel, Line
from dedoc_spark.core.toc import TOC_TITLES, build_toc, end_with_num, get_toc
from dedoc_spark.core.structure import get_dotted_item_depth, prefix_split_postprocess

# tz_feature_extractor.py:19 / bullet_prefix.py:20
named_item_regexp = re.compile(r"^(под)?раздел\s*")
bullet_regexp = re.compile(r"^\s*(-|—|−|–|®|\.|•|\,|‚|©|⎯|°|\*|>|\| -|●|♣|①|▪|\*|\+)")


# --- TZ ----------------------------------------------------------------------


def _tz_handle_item(
    init_hl_depth: int, line: Line, prediction: str, previous_hl: Optional[HierarchyLevel]
) -> HierarchyLevel:
    """tz_builder/body_builder.py:40-66 (__handle_item + the previous-HL
    type-inheritance quirks, kept verbatim incl. the always-true
    level_2 == level_2 comparison)."""
    text = line.line.lower().strip()
    item_min_depth = 5 + init_hl_depth
    if prediction == "part":
        hierarchy_level = HierarchyLevel(init_hl_depth + 1, 0, True, prediction)
    elif named_item_regexp.match(text):
        if "подраздел" in text:
            hierarchy_level = HierarchyLevel(item_min_depth + 2, 1, False, prediction)
        else:
            hierarchy_level = HierarchyLevel(item_min_depth + 2, 0, False, prediction)
    elif regexps_number.match(text):
        match = regexps_number.match(text)
        number = text[match.start(): match.end()]
        number_splitted = [n for n in number.strip().split(".") if n.isnumeric()]
        hierarchy_level = HierarchyLevel(item_min_depth + 3, len(number_splitted), False, prediction)
    elif bullet_regexp.match(text):
        hierarchy_level = HierarchyLevel(item_min_depth + 4, 0, False, prediction)
    elif regexps_subitem.match(text):
        hierarchy_level = HierarchyLevel(item_min_depth + 4, 0, False, prediction)
    else:
        hierarchy_level = HierarchyLevel.create_raw_text()
    if previous_hl is not None and previous_hl <= hierarchy_level and not hierarchy_level.is_raw_text():
        if previous_hl.level_1 == hierarchy_level.level_1 and previous_hl.level_2 == previous_hl.level_2:
            hierarchy_level.line_type = previous_hl.line_type
        elif previous_hl < hierarchy_level and previous_hl.line_type == "item":
            hierarchy_level.line_type = previous_hl.line_type
    return hierarchy_level


def _synthetic_body_line(init_hl_depth: int, page_id: int = 0, line_id: int = 0) -> Line:
    from dedoc_spark.core.law_structure import _synthetic_body_line as law_body

    ln = law_body(init_hl_depth)
    ln.page_id = page_id
    ln.line_id = line_id
    return ln


def _tz_build_body(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int) -> List[Line]:
    """tz_builder/body_builder.py:15-38."""
    if lines_with_labels:
        first = lines_with_labels[0][0]
        result = [_synthetic_body_line(init_hl_depth, first.page_id, first.line_id or 0)]
    else:
        result = [_synthetic_body_line(init_hl_depth)]
    previous_hl: Optional[HierarchyLevel] = None
    for line, prediction in lines_with_labels:
        if prediction in ("part", "named_item", "item"):
            line.hl = _tz_handle_item(init_hl_depth, line, prediction, previous_hl)
            previous_hl = line.hl
            result.append(line)
        else:
            line.hl = HierarchyLevel.create_raw_text()
            result.append(line)
    return result


def predict_tz_labels(lines: Sequence[Line]) -> List[str]:
    """Deterministic stand-in for TzLineTypeClassifier (module docstring):
    TOC-shaped lines → toc, (под)раздел / numbered / bulleted / lettered
    starts → item (the tz body builder re-derives the precise level from
    the same regexps), everything else raw_text."""
    labels: List[str] = []
    for ln in lines:
        text = ln.line.strip().lower()
        # toc shape wins: an entry like "Раздел 1 … .... 2" is a TOC item,
        # not a body item (the trained classifier separates these zones)
        if end_with_num.match(text) and not text.isdigit():
            labels.append("toc")
        elif named_item_regexp.match(text) or regexps_number.match(text) or bullet_regexp.match(text) or regexps_subitem.match(text):
            labels.append("item")
        else:
            labels.append("raw_text")
    return labels


def extract_tz_structure(
    lines: List[Line], labels: Optional[List[str]] = None, labeler=None
) -> List[Line]:
    """tz_structure_extractor.py:50-77: header / toc / body zone split
    (verbatim control flow incl. the last_toc_line bound and the
    содержание/оглавление trigger), builders, item prefix-split.
    ``labeler`` swaps the regex stand-in for a callable."""
    from dedoc_spark.core.law_structure import _build_header

    if labels is None:
        labels = (labeler or predict_tz_labels)(lines)
    header_lines: List[Tuple[Line, str]] = []
    toc_lines: List[Tuple[Line, str]] = []
    body_lines: List[Tuple[Line, str]] = []
    last_toc_line = max(
        (line_id for line_id, p in enumerate(labels) if p in ("toc", "title")), default=0
    )
    is_toc_begun = False
    is_body_begun = False
    for line_id, (line, prediction) in enumerate(zip(lines, labels)):
        if prediction in ("part", "item") or is_body_begun:
            body_lines.append((line, prediction))
            is_body_begun = True
        elif line_id > last_toc_line:
            is_body_begun = True
            body_lines.append((line, prediction))
        elif (prediction == "toc" and not is_body_begun) or (not is_body_begun and is_toc_begun):
            toc_lines.append((line, prediction))
            is_toc_begun = True
        elif line.line.lower().strip() in ("содержание", "оглавление") and not is_toc_begun:
            is_toc_begun = True
            toc_lines.append((line, "toc"))
        else:
            header_lines.append((line, prediction))

    header = _build_header(header_lines, 0, "law")  # root levels, like law header
    toc = build_toc(toc_lines, init_hl_depth=1)
    body = _tz_build_body(body_lines, init_hl_depth=1)
    return prefix_split_postprocess(
        header + toc + body,
        ["item"],
        [bullet_regexp, regexps_number, regexps_subitem],
        [None, regexps_ends_of_number, regexps_ends_of_number],
    )


# --- diploma -----------------------------------------------------------------

NAMED_ITEM_KEYWORDS = (
    "введение", "заключение", "библиографический список", "список литературы",
    "глава", "приложение", "приложения",
)
footnote_start_regexp = re.compile(r"^\d+ ")

# diploma pattern composition (diploma_builder/body_builder.py:22-31),
# expressed with the same prefix regexes the reference's pattern classes
# compile: dotted "1.2." lists, bracket "1)", letter "а)/a)", bullets.
_BRACKET_RE = re.compile(r"^\s*\d+\)")
_LETTER_RE = re.compile(r"^\s*[a-zа-яё]\)")
_DOTTED_RE = re.compile(r"^\s*(\d+\.)+(\d+)?\s")


def _diploma_pattern_level(line: Line) -> HierarchyLevel:
    """PatternComposition.get_hierarchy_level for the diploma chain:
    TagList → Dotted(level_1=2) → Bracket(3,1) → Letter(4,1) →
    Bullet(5,1) → raw_text."""
    text = line.line.strip().lower()
    if line.tag_hl is not None and line.tag_hl.line_type == HierarchyLevel.list_item:
        lvl = HierarchyLevel(
            line.tag_hl.level_1 if line.tag_hl.level_1 is not None else 2,
            line.tag_hl.level_2,
            False,
            HierarchyLevel.list_item,
        )
        return lvl
    depth = get_dotted_item_depth(text)
    if depth != -1:
        return HierarchyLevel(2, depth, False, HierarchyLevel.list_item)
    if _BRACKET_RE.match(text):
        return HierarchyLevel(3, 1, False, HierarchyLevel.list_item)
    if _LETTER_RE.match(text):
        return HierarchyLevel(4, 1, False, HierarchyLevel.list_item)
    if bullet_regexp.match(text):
        return HierarchyLevel(5, 1, False, HierarchyLevel.list_item)
    return HierarchyLevel.create_raw_text()


def _diploma_handle_named_item(
    init_hl_depth: int, line: Line, prediction: str, previous_named_item_line: Optional[Line]
) -> Line:
    """diploma_builder/body_builder.py:64-79."""
    text = line.line.strip().lower()
    item_depth = get_dotted_item_depth(text)
    if text.startswith(NAMED_ITEM_KEYWORDS):
        hierarchy_level = HierarchyLevel(init_hl_depth, 0, True, prediction)
    elif item_depth == -1:
        if previous_named_item_line is not None and previous_named_item_line.hl is not None:
            hierarchy_level = previous_named_item_line.hl
        else:
            hierarchy_level = HierarchyLevel(init_hl_depth, 0, True, prediction)
    else:
        hierarchy_level = HierarchyLevel(init_hl_depth, item_depth - 1, True, prediction)
    line.hl = hierarchy_level
    return line


def _diploma_postprocess_raw_text(line: Line, init_hl_depth: int) -> Line:
    """diploma_builder/body_builder.py:81-90: a BOLD line starting with a
    named-item keyword is promoted to named_item."""
    text = line.line.strip().lower()
    if not text.startswith(NAMED_ITEM_KEYWORDS):
        return line
    bold = [a for a in line.annotations if a.name == "bold" and a.value == "True"]
    if len(bold) == 0:
        return line
    return _diploma_handle_named_item(init_hl_depth, line, "named_item", None)


def _diploma_build_body(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int) -> List[Line]:
    """diploma_builder/body_builder.py:33-62."""
    if lines_with_labels:
        first = lines_with_labels[0][0]
        result = [_synthetic_body_line(init_hl_depth, first.page_id, first.line_id or 0)]
    else:
        result = [_synthetic_body_line(init_hl_depth)]
    previous_named_item_line: Optional[Line] = None
    for line, prediction in lines_with_labels:
        if prediction == "named_item" or (
            line.tag_hl is not None and line.tag_hl.line_type == "header"
        ):
            line = _diploma_handle_named_item(init_hl_depth, line, prediction, previous_named_item_line)
            previous_named_item_line = line
        elif prediction == "list_item":
            # the reference reads the list level from the reader-assigned
            # tag (TagListPattern); tag-less lines (txt path) derive the
            # same level from the pattern chain instead
            tag = line.tag_hl if line.tag_hl is not None else HierarchyLevel.create_unknown()
            if tag.line_type != HierarchyLevel.list_item or tag.level_1 is None:
                tag = _diploma_pattern_level(line)
            tag_level_1 = tag.level_1 if tag.level_1 is not None else 1
            tag_level_2 = tag.level_2 if tag.level_2 is not None else 1
            level_1 = (
                previous_named_item_line.hl.level_1 + tag_level_1 - 1
                if previous_named_item_line is not None and previous_named_item_line.hl is not None
                else init_hl_depth + tag_level_1 - 1
            )
            line.hl = HierarchyLevel(level_1, tag_level_2, True, prediction)
        elif prediction == "page_id":
            line.hl = HierarchyLevel(None, None, False, prediction)
        elif prediction == "raw_text":
            line = _diploma_postprocess_raw_text(line, init_hl_depth)
            if not (line.hl is not None and line.hl.line_type == "named_item"):
                line.hl = _diploma_pattern_level(line)
        else:
            line.hl = HierarchyLevel.create_raw_text()
            line.hl.line_type = prediction
        result.append(line)
    return result


def _replace_toc_lines(lines: List[Line]) -> List[Line]:
    """diploma_structure_extractor.py:73-102: detected TOC items replace
    the raw in-TOC lines (merged multiline items, 'toc' tag), the TOC
    title keeps its line."""
    toc_items = get_toc(lines)
    if len(toc_items) == 0:
        return lines
    toc_lines = [item.line for item in toc_items]
    # a multiline item's merged line keeps its FIRST component's id; the
    # excised range must extend to the closing component (toc_span_last_id)
    # or the continuation line would survive the filter AND appear inside
    # the merged item — duplicated text
    min_id = min(ln.line_id or 0 for ln in toc_lines)
    max_id = max(
        max(ln.line_id or 0, ln.extras.get("toc_span_last_id") or 0) for ln in toc_lines
    )

    lines_wo_toc: List[Line] = []
    toc_title: Optional[Line] = None
    for line in lines:
        lid = line.line_id or 0
        if lid < min_id and line.line.strip().lower() in TOC_TITLES:
            toc_title = line
            toc_title.tag_hl = HierarchyLevel(None, None, True, "toc")
        elif not (min_id <= lid <= max_id):
            lines_wo_toc.append(line)

    merged: List[Line] = [toc_title] if toc_title is not None else []
    for item in toc_items:
        item.line.tag_hl = HierarchyLevel(None, None, True, "toc")
        item.line.extras["tocitem_page"] = item.page
        merged.append(item.line)
    out = lines_wo_toc + merged
    out.sort(key=lambda x: (x.page_id, x.line_id or 0))
    return out


def _replace_footnote_lines(lines: List[Line]) -> List[Line]:
    """diploma_structure_extractor.py:104-134: consecutive footnote-tagged
    lines merge until the next footnote start (^\\d+ ) or a plain line."""
    fixed: List[Line] = []
    current: Optional[Line] = None
    for line in lines:
        is_footnote = line.tag_hl is not None and line.tag_hl.line_type == "footnote"
        if not is_footnote and current is None:
            fixed.append(line)
        elif not is_footnote:
            current.tag_hl = HierarchyLevel(None, None, True, "footnote")
            fixed.append(current)
            fixed.append(line)
            current = None
        elif current is None:
            current = line
        elif footnote_start_regexp.match(line.line):
            current.tag_hl = HierarchyLevel(None, None, True, "footnote")
            fixed.append(current)
            current = line
        else:
            current = current.concat(line)
    if current is not None:
        current.tag_hl = HierarchyLevel(None, None, True, "footnote")
        fixed.append(current)
    return fixed


def _add_page_id_lines(lines: List[Line]) -> None:
    """diploma_structure_extractor.py:136-141: a bare digit line at a page
    boundary is a page number."""
    for i in range(1, len(lines) - 1):
        line = lines[i]
        if (
            lines[i - 1].page_id < line.page_id or line.page_id < lines[i + 1].page_id
        ) and line.line.strip().isdigit():
            line.tag_hl = HierarchyLevel(None, None, True, "page_id")


def predict_diploma_labels(lines: Sequence[Line]) -> List[str]:
    """Deterministic stand-in for DiplomaLineTypeClassifier (module
    docstring): named-item keywords → named_item, list prefixes →
    list_item, title zone = everything before the first named item,
    else raw_text."""
    labels: List[str] = []
    seen_named = False
    for ln in lines:
        if ln.tag_hl is not None and ln.tag_hl.line_type in ("toc", "page_id", "footnote"):
            labels.append(ln.tag_hl.line_type)
            continue
        text = ln.line.strip().lower()
        if text.startswith(NAMED_ITEM_KEYWORDS):
            labels.append("named_item")
            seen_named = True
        elif _DOTTED_RE.match(text) or _BRACKET_RE.match(text) or _LETTER_RE.match(text) or bullet_regexp.match(text):
            labels.append("list_item" if seen_named else "title")
        elif not seen_named:
            labels.append("title")
        else:
            labels.append("raw_text")
    return labels


def extract_diploma_structure(
    lines: List[Line], labels: Optional[List[str]] = None, labeler=None
) -> List[Line]:
    """diploma_structure_extractor.py:38-71: toc replace → footnote merge
    → page-id typing → label → zone split → builders → page/line sort."""
    from dedoc_spark.core.law_structure import _build_header

    lines = _replace_toc_lines(lines)
    lines = _replace_footnote_lines(lines)
    _add_page_id_lines(lines)

    toc_items = get_toc(lines, by_tag="toc")
    lines_for_predict = [
        ln for ln in lines
        if not (ln.tag_hl is not None and ln.tag_hl.line_type in ("toc", "page_id", "footnote"))
    ]
    if labels is None:
        predictions = (labeler or predict_diploma_labels)(lines_for_predict)
    else:
        predictions = labels
    for line, prediction in zip(lines_for_predict, predictions):
        line.extras["_diploma_label"] = prediction

    header_lines = [
        (ln, "title") for ln in lines if ln.extras.get("_diploma_label") == "title"
    ]
    body_lines = [
        (ln, ln.extras.get("_diploma_label", ln.tag_hl.line_type if ln.tag_hl else "raw_text"))
        for ln in lines
        if ln.extras.get("_diploma_label") not in ("title",)
        and not (ln.tag_hl is not None and ln.tag_hl.line_type == "toc")
    ]
    toc_lines = [(item.line, "toc") for item in toc_items]

    header = _build_header(header_lines, 0, "law")
    toc = build_toc(toc_lines, init_hl_depth=1)
    body = _diploma_build_body(body_lines, init_hl_depth=1)
    out = header + toc + body
    out.sort(key=lambda x: (x.page_id, x.line_id if x.line_id is not None else 0))
    return out
