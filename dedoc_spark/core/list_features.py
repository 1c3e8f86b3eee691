"""ListFeaturesExtractor family — the windowed list-structure features the
reference's line classifiers consume alongside the text features.

Ports (file:line refs into the reference):
  - prefix classes with PREDECESSOR semantics
    (list_features/prefix/{prefix,bullet_prefix,letter_prefix,
    bracket_prefix,dotted_prefix,empty_prefix}.py): bullets match only an
    identical glyph; letters are predecessors when exactly one ordinal
    apart — with the ё/Ё placed between е and ж by ORDER (the reference's
    explicit quirk, letter_prefix.py:22-28); bracket numbers must differ
    by exactly 1; dotted prefixes accept same-depth +1 on the last
    number, a first child (…,1), and the deeper-other branch comparing
    against other.numbers[len(self)-1] — all three branches kept
    verbatim (dotted_prefix.py:15-34).
  - get_prefix (list_utils.py:20-28): first matching regexp on the
    strip().lower() text wins, in Bullet → Letter → Bracket → Dotted
    order; otherwise EmptyPrefix. Indent comes from the line's layout
    extras when present, else 0 (the text-only mode — the reference
    reads the indentation annotation the pdf layout family sets).
  - ListFeaturesExtractor.one_document (list_features_extractor.py:
    48-100): per line, over a ±window_size window, the fractions of
    neighbors that are predecessors/successors, that share the indent
    (|Δ| ≤ 0.1·window_std + 1, _same_indent), and both — each divided
    by len(window)+1 exactly like the reference.

Pure Python, numpy only for the window std — usable from the labelers
and inside mapInPandas.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple


class LinePrefix:
    name = ""
    regexp: Optional[re.Pattern] = None

    def __init__(self, prefix: str, indent: float) -> None:
        self.prefix = prefix
        self.indent = indent

    def predecessor(self, other: "LinePrefix") -> bool:
        raise NotImplementedError

    def successor(self, other: "LinePrefix") -> bool:
        return other.predecessor(self)


class BulletPrefix(LinePrefix):
    name = "non_letter"
    regexp = re.compile(r"^\s*(-|—|−|–|®|\.|•|\,|‚|©|⎯|°|\*|>|\| -|●|♣|①|▪|\*|\+)")

    def predecessor(self, other: LinePrefix) -> bool:
        return isinstance(other, BulletPrefix) and self.prefix == other.prefix


class LetterPrefix(LinePrefix):
    name = "letter"
    regexp = re.compile(r"^\s*[а-яёa-z]\)")

    @property
    def order(self) -> float:
        letter = self.prefix[0]
        if letter == "ё":  # between е and ж, but ord("ё") is not
            return 0.5 * (ord("е") + ord("ж"))
        if letter == "Ё":
            return 0.5 * (ord("Е") + ord("Ж"))
        return ord(letter)

    def predecessor(self, other: LinePrefix) -> bool:
        return isinstance(other, LetterPrefix) and 1 >= (self.order - other.order) > 0


class BracketPrefix(LinePrefix):
    name = "bracket"
    regexp = re.compile(r"^\s*\d\)")

    def __init__(self, prefix: str, indent: float) -> None:
        super().__init__(prefix, indent)
        self.prefix_num = int(self.prefix[:-1])

    def predecessor(self, other: LinePrefix) -> bool:
        return isinstance(other, BracketPrefix) and self.prefix_num == other.prefix_num + 1


class DottedPrefix(LinePrefix):
    name = "dotted"
    regexp = re.compile(r"^\s*(\d+\.)+(\d+)?\s*")

    def __init__(self, prefix: str, indent: float) -> None:
        super().__init__(prefix, indent)
        self.numbers = [int(n) for n in self.prefix.split(".") if len(n) > 0]

    def predecessor(self, other: LinePrefix) -> bool:
        if not isinstance(other, DottedPrefix):
            return False
        if len(self.numbers) == len(other.numbers):
            for n1, n2 in zip(self.numbers[:-1], other.numbers[:-1]):
                if n1 != n2:
                    return False
            return self.numbers[-1] - other.numbers[-1] == 1
        if len(self.numbers) == 1 + len(other.numbers):
            for n1, n2 in zip(self.numbers, other.numbers):
                if n1 != n2:
                    return False
            return self.numbers[-1] == 1
        if len(other.numbers) > len(self.numbers):
            for n1, n2 in zip(self.numbers[:-1], other.numbers[:-1]):
                if n1 != n2:
                    return False
            return self.numbers[-1] == other.numbers[len(self.numbers) - 1] + 1
        return False


class EmptyPrefix(LinePrefix):
    name = "empty"

    def __init__(self, prefix: str = "", indent: float = 0.0) -> None:
        super().__init__("", indent)

    def predecessor(self, other: LinePrefix) -> bool:
        return False


PREFIX_LIST = [BulletPrefix, LetterPrefix, BracketPrefix, DottedPrefix]


def get_prefix(text: str, indent: float = 0.0) -> LinePrefix:
    """list_utils.get_prefix: first matching class on strip().lower()."""
    low = text.strip().lower()
    for cls in PREFIX_LIST:
        m = cls.regexp.match(low)
        if m:
            return cls(m.group().strip(), indent)
    return EmptyPrefix(indent=indent)


def _same_indent(this_indent: float, other_indent: float, std: float) -> bool:
    return abs(this_indent - other_indent) <= 0.1 * std + 1  # eps = 1


def list_features_one_document(
    texts: Sequence[str],
    indents: Optional[Sequence[float]] = None,
    window_size: int = 25,
) -> List[Dict[str, float]]:
    """Per-line window features (list_features_extractor.py:48-86):
    same_indent / predecessor_num / predecessor_num_same_indent fractions
    over the ±window_size neighborhood, normalized by len(window)+1."""
    import numpy as np

    n = len(texts)
    if indents is None:
        indents = [0.0] * n
    prefixes = [get_prefix(t, i) for t, i in zip(texts, indents)]
    indent_arr = np.array([p.indent for p in prefixes], dtype=np.float64)
    out: List[Dict[str, float]] = []
    for line_id, prefix in enumerate(prefixes):
        left = max(line_id - window_size, 0)
        right = min(line_id + window_size, n)
        std = float(indent_arr[left:right].std()) if right > left else 0.0
        neighbors = prefixes[left:line_id] + prefixes[line_id + 1 : right]
        predecessor_num = 0
        predecessor_num_same_indent = 0
        same_indent = 0
        for other in neighbors:
            is_pred = prefix.predecessor(other) or prefix.successor(other)
            is_same = _same_indent(prefix.indent, other.indent, std)
            predecessor_num += is_pred
            same_indent += is_same
            predecessor_num_same_indent += is_same and is_pred
        denom = len(neighbors) + 1
        out.append(
            {
                f"same_indent_{window_size}": same_indent / denom,
                f"predecessor_num_same_indent_{window_size}": predecessor_num_same_indent / denom,
                f"predecessor_num_{window_size}": predecessor_num / denom,
            }
        )
    return out
