"""FinTOC structure extractor — rule-based parts.

Port of fintoc_structure_extractor.py (the ISP RAS FinTOC-2022 winner
solution as shipped in the reference):

  - language param routing      __get_param_language (:80-95)
  - line filtering              __filter_lines (:104-112): empty-line drop
                                + special-unicode bullet stripping
  - output contract             extract (:60-77): prediction > 0 → header
                                line with level_1=1, level_2=prediction
                                (the FinTOC TOC depth), else raw_text
  - TOC fallback                __get_toc (:114-129) collapses here to the
                                shared heuristic core/toc.get_toc (the
                                pdftocio subprocess needs an external
                                binary — documented skip)

The per-language XGBoost classifiers are downloaded model artifacts
(fintoc_classifier.py — same scope decision as the other domain
extractors): ``predict_fintoc_depths`` is a documented deterministic
stand-in that marks a line as a title when it matches a detected TOC
item (difflib ratio ≥ 0.8, the is_line_in_toc signal the reference's
feature extractor feeds the model) with depth = its dotted-item depth
(min 1); a trained model's predictions can be passed via
``predictions``.
"""

from __future__ import annotations

import difflib
import re
from typing import List, Optional, Sequence

from dedoc_spark.core.model import HierarchyLevel, Line
from dedoc_spark.core.structure import get_dotted_item_depth
from dedoc_spark.core.toc import get_toc

SPECIAL_UNICODE_SYMBOLS = [
    "\uf0b7", "\uf0d8", "\uf084", "\uf0a7", "\uf0f0", "\x83",
]  # private-use bullet glyphs the reference strips (:105)
# the reference regexp is ^\s*\n$ over \n-terminated LineWithMeta text;
# this engine's pdf lines carry no trailing newline, so the port widens
# to any whitespace-only line (same intent: drop blanks)
empty_string_regexp = re.compile(r"^\s*\n$|^\s+$")

LANGUAGES = ("en", "fr", "sp")


def get_param_language(parameters: dict) -> str:
    """__get_param_language port: en/eng/rus+eng → en, fr/fra → fr,
    sp/spa → sp, anything else → en."""
    language = parameters.get("language", "en")
    if language in ("en", "eng", "rus+eng"):
        return "en"
    if language in ("fr", "fra"):
        return "fr"
    if language in ("sp", "spa"):
        return "sp"
    return "en"


def filter_lines(lines: Sequence[Line]) -> List[Line]:
    """__filter_lines port: drop whitespace-only lines, strip the special
    bullet code points in place."""
    kept = [ln for ln in lines if not empty_string_regexp.match(ln.line)]
    for ln in kept:
        for ch in SPECIAL_UNICODE_SYMBOLS:
            ln.line = ln.line.replace(ch, "")
    return kept


def predict_fintoc_depths(lines: Sequence[Line], threshold: float = 0.8) -> List[int]:
    """Deterministic stand-in for the per-language XGBoost classifiers
    (module docstring): a line is a title (depth ≥ 1) when it closely
    matches a heuristic-detected TOC item — the is_line_in_toc feature
    (toc_feature_extractor.py:157-166) promoted to the decision — with
    depth from its dotted numbering (1 when unnumbered)."""
    toc = get_toc(lines)
    if not toc:
        return [0] * len(lines)
    # strip the page number and the "……" leader before matching body
    # lines against TOC entries (shared filter_toc_line semantics)
    toc_texts = [t.stripped_text().lower() for t in toc]
    out: List[int] = []
    for ln in lines:
        text = ln.line.strip().lower()
        ratio = max(
            (difflib.SequenceMatcher(None, t, text).ratio() for t in toc_texts), default=0.0
        )
        if ratio >= threshold and text:
            depth = get_dotted_item_depth(text)
            out.append(depth if depth > 0 else 1)
        else:
            out.append(0)
    return out


def extract_fintoc_structure(
    lines: List[Line],
    parameters: Optional[dict] = None,
    predictions: Optional[List[int]] = None,
) -> List[Line]:
    """FinTOC title-detection contract (extract, :60-77): title lines get
    HierarchyLevel(1, depth, True, header), everything else raw_text."""
    parameters = parameters or {}
    get_param_language(parameters)  # validated/normalized like the reference
    lines = filter_lines(lines)
    if predictions is None:
        predictions = predict_fintoc_depths(lines)
    assert len(lines) == len(predictions)
    for line, prediction in zip(lines, predictions):
        if prediction > 0:
            line.hl = HierarchyLevel(1, prediction, True, HierarchyLevel.header)
        else:
            line.hl = HierarchyLevel.create_raw_text()
    return lines
