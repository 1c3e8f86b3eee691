"""Core data model: annotations, hierarchy levels, lines.

Semantics follow the reference data structures:
  - Annotation:      dedoc/data_structures/annotation.py:5-39
  - HierarchyLevel:  dedoc/data_structures/hierarchy_level.py:6-141
    (None level compares as +inf, lexicographic (level_1, level_2))
  - LineWithMeta:    dedoc/data_structures/line_with_meta.py:9-191
    (annotation-consistent concatenation via __add__ / join)

This is a fresh implementation on plain slotted classes (no pydantic, no
uuid): every uid is content-derived so the pipeline is deterministic and
resumable (SURVEY.md §7.0).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

_INF = float("inf")

# Annotation names whose instances must never be merged even when the
# (name, value) pair repeats — mirrors is_mergeable=False in the reference
# concrete annotations (linked_text_annotation.py:17, table_annotation.py:17,
# attach_annotation.py:18, bbox_annotation.py:27, confidence_annotation.py:22,
# reference_annotation.py:43).
NON_MERGEABLE_NAMES = frozenset(
    {"linked_text", "table", "attachment", "bounding box", "confidence", "reference"}
)


class Annotation:
    """Span annotation over a line's text: [start, end) with a stringly value."""

    __slots__ = ("start", "end", "name", "value")

    def __init__(self, start: int, end: int, name: str, value: str) -> None:
        self.start = start
        self.end = end
        self.name = name
        self.value = value

    @property
    def is_mergeable(self) -> bool:
        return self.name not in NON_MERGEABLE_NAMES

    def __eq__(self, o: object) -> bool:
        return (
            isinstance(o, Annotation)
            and self.name == o.name
            and self.value == o.value
            and self.start == o.start
            and self.end == o.end
        )

    def __repr__(self) -> str:
        return f"{self.name.capitalize()}({self.start}:{self.end}, {self.value})"

    def to_dict(self) -> Dict:
        return {"start": self.start, "end": self.end, "name": self.name, "value": self.value}


class HierarchyLevel:
    """Line importance: lexicographic (level_1, level_2), None == +inf.

    Line types as in hierarchy_level.py:29-39.
    """

    __slots__ = ("level_1", "level_2", "can_be_multiline", "line_type")

    root = "root"
    toc = "toc"
    header = "header"
    toc_item = "toc_item"
    list = "list"  # noqa: A003
    list_item = "list_item"
    bullet_list_item = "bullet_list_item"
    raw_text = "raw_text"
    footer = "footer"
    page_id = "page_id"
    unknown = "unknown"

    def __init__(
        self,
        level_1: Optional[float],
        level_2: Optional[float],
        can_be_multiline: bool,
        line_type: str,
    ) -> None:
        assert level_1 is None or level_1 >= 0
        assert level_2 is None or level_2 >= 0
        self.level_1 = level_1
        self.level_2 = level_2
        self.can_be_multiline = can_be_multiline
        self.line_type = line_type

    def _key(self) -> Tuple[float, float]:
        return (
            _INF if self.level_1 is None else self.level_1,
            _INF if self.level_2 is None else self.level_2,
        )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, HierarchyLevel):
            return False
        return self._key() == other._key()

    def __lt__(self, other: "HierarchyLevel") -> bool:
        return self._key() < other._key()

    def __le__(self, other: "HierarchyLevel") -> bool:
        return self._key() <= other._key()

    def __gt__(self, other: "HierarchyLevel") -> bool:
        return self._key() > other._key()

    def __ge__(self, other: "HierarchyLevel") -> bool:
        return self._key() >= other._key()

    def __repr__(self) -> str:
        return f"HL({self.level_1},{self.level_2},{self.can_be_multiline},{self.line_type})"

    def is_raw_text(self) -> bool:
        return self.line_type == HierarchyLevel.raw_text

    def is_unknown(self) -> bool:
        return self.line_type == HierarchyLevel.unknown

    def is_list_item(self) -> bool:
        return self.line_type == HierarchyLevel.list_item

    def copy(self) -> "HierarchyLevel":
        return HierarchyLevel(self.level_1, self.level_2, self.can_be_multiline, self.line_type)

    @staticmethod
    def create_raw_text() -> "HierarchyLevel":
        return HierarchyLevel(None, None, True, HierarchyLevel.raw_text)

    @staticmethod
    def create_unknown() -> "HierarchyLevel":
        return HierarchyLevel(None, None, True, HierarchyLevel.unknown)

    @staticmethod
    def create_root() -> "HierarchyLevel":
        return HierarchyLevel(0, 0, True, HierarchyLevel.root)

    def to_dict(self) -> Dict:
        return {
            "level_1": self.level_1,
            "level_2": self.level_2,
            "can_be_multiline": self.can_be_multiline,
            "line_type": self.line_type,
        }


class Line:
    """A document line with metadata and span annotations.

    Mirrors LineWithMeta + LineMetadata (line_metadata.py:27-44): the
    reader-assigned ``tag_hl`` defaults to *unknown* (never None), the
    extractor-assigned ``hl`` starts as None. ``extras`` is the open
    metadata bag (e.g. ``html_tag`` set at html_reader.py:75-77).
    """

    __slots__ = ("line", "page_id", "line_id", "tag_hl", "hl", "annotations", "uid", "extras")

    def __init__(
        self,
        line: str,
        page_id: int = 0,
        line_id: Optional[int] = None,
        tag_hl: Optional[HierarchyLevel] = None,
        hl: Optional[HierarchyLevel] = None,
        annotations: Optional[List[Annotation]] = None,
        uid: str = "",
        extras: Optional[Dict] = None,
    ) -> None:
        self.line = line
        self.page_id = page_id
        self.line_id = line_id
        self.tag_hl = HierarchyLevel.create_unknown() if tag_hl is None else tag_hl
        self.hl = hl
        self.annotations = [] if annotations is None else annotations
        self.uid = uid
        self.extras = {} if extras is None else extras

    def __len__(self) -> int:
        return len(self.line)

    def concat(self, other: "Line") -> "Line":
        """Concatenate keeping annotations consistent (line_with_meta.py:162-178).

        Returns a new Line with self's metadata/uid; other's annotations are
        shifted by len(self) and the union is run through the merger.
        """
        from dedoc_spark.core.annotation_merger import merge_annotations

        if len(other.line) == 0:
            return self
        text = self.line + other.line
        shift = len(self.line)
        shifted = [
            Annotation(a.start + shift, a.end + shift, a.name, a.value) for a in other.annotations
        ]
        merged = merge_annotations(self.annotations + shifted, text)
        return Line(
            line=text,
            page_id=self.page_id,
            line_id=self.line_id,
            tag_hl=self.tag_hl,
            hl=self.hl,
            annotations=merged,
            uid=self.uid,
            extras=self.extras,
        )

    def to_dict(self) -> Dict:
        return {
            "line": self.line,
            "page_id": self.page_id,
            "line_id": self.line_id,
            "tag_hl": self.tag_hl.to_dict() if self.tag_hl is not None else None,
            "hl": self.hl.to_dict() if self.hl is not None else None,
            "annotations": [a.to_dict() for a in self.annotations],
            "uid": self.uid,
            "extras": {k: str(v) for k, v in self.extras.items()},
        }


class Cell:
    """Table cell (cell_with_meta.py:9-57): lines + span info."""

    __slots__ = ("lines", "colspan", "rowspan", "invisible")

    def __init__(
        self,
        lines: Optional[List[Line]] = None,
        colspan: int = 1,
        rowspan: int = 1,
        invisible: bool = False,
    ) -> None:
        self.lines = [] if lines is None else lines
        self.colspan = colspan
        self.rowspan = rowspan
        self.invisible = invisible

    def get_text(self) -> str:
        return "\n".join(line.line for line in self.lines)

    def to_dict(self) -> Dict:
        return {
            "lines": [line.to_dict() for line in self.lines],
            "colspan": self.colspan,
            "rowspan": self.rowspan,
            "invisible": self.invisible,
        }


class Table:
    """Rectangular row-major table (table.py:9-32): merged cells are
    duplicated into every covered slot with invisible=True on clones."""

    __slots__ = ("cells", "page_id", "uid", "title")

    def __init__(self, cells: List[List[Cell]], page_id: int = 0, uid: str = "", title: str = "") -> None:
        self.cells = cells
        self.page_id = page_id
        self.uid = uid
        self.title = title

    def to_dict(self) -> Dict:
        return {
            "cells": [[c.to_dict() for c in row] for row in self.cells],
            "page_id": self.page_id,
            "uid": self.uid,
            "title": self.title,
        }
