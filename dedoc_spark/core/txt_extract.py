"""Plain-text → lines extraction with the reference txt reader's semantics.

Reference: dedoc/readers/txt_reader/raw_text_reader.py:34-130.

Reproduced behaviors:
  - line iteration keeps the trailing newline (file-iteration style);
  - NFC normalization plus recomposition of decomposed "й" (и + combining
    breve U+0306 → precomposed U+0439) — raw_text_reader.py:93;
  - uid = "txt_{content_hash}_{line_id}" (determinism test
    tests/unit_tests/test_format_txt_reader.py:14-39);
  - spacing annotation = str(int(100 * (0.5 if no empty predecessors else
    count of immediately preceding empty lines)));
  - indentation annotation = str(211 * cnt), tab counts 3, space counts 1;
  - paragraph flag: can_be_multiline=False when the leading-space width
    (tab expanded to 4 here — a reference quirk, :105) grows by ≥ 2 vs the
    previous line.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from typing import List

from dedoc_spark.core.model import Annotation, Line

_SPACE_RE = re.compile(r"^\s+")
_DECOMPOSED_I_KRATKOE = "й"  # и + combining breve
_I_KRATKOE = "й"


def split_keepends(text: str) -> List[str]:
    """File-iteration-style line split: each line keeps its '\\n'."""
    return text.splitlines(keepends=True)


def extract_txt_lines(text: str, content_hash: str = "") -> List[Line]:
    if not content_hash:
        content_hash = hashlib.md5(text.encode()).hexdigest()

    lines: List[Line] = []
    number_of_empty_lines = 0
    for line_id, raw in enumerate(split_keepends(text)):
        line = unicodedata.normalize("NFC", raw).replace(_DECOMPOSED_I_KRATKOE, _I_KRATKOE)
        spacing_value = str(int(100 * (0.5 if number_of_empty_lines == 0 else number_of_empty_lines)))
        annotations = [
            Annotation(0, len(line), "spacing", spacing_value),
            _indent_annotation(line),
        ]
        lines.append(
            Line(
                line=line,
                page_id=0,
                line_id=line_id,
                annotations=annotations,
                uid=f"txt_{content_hash}_{line_id}",
            )
        )
        number_of_empty_lines = number_of_empty_lines + 1 if line.isspace() else 0

    _assign_paragraph_flags(lines)
    return lines


def _indent_annotation(line: str) -> Annotation:
    m = _SPACE_RE.match(line)
    if m is None:
        return Annotation(0, len(line), "indentation", "0")
    cnt = sum(3 if ch == "\t" else 1 for ch in m.group())
    return Annotation(0, len(line), "indentation", str(211 * cnt))


def _starting_spacing(line: Line | None) -> int:
    if line is None or line.line.isspace():
        return 0
    m = _SPACE_RE.match(line.line.replace("\t", " " * 4))
    return 0 if m is None else m.end() - m.start()


def _assign_paragraph_flags(lines: List[Line]) -> None:
    previous = None
    for line in lines:
        is_paragraph = (
            not line.line.isspace()
            and _starting_spacing(line) - _starting_spacing(previous) >= 2
        )
        line.tag_hl.can_be_multiline = not is_paragraph
        previous = line
