"""Law-family structure extraction — the rule-based parts of the
reference's law extractors, ported faithfully:

  - regex table                 hierarchy_level_builders/utils_reg.py:1-21
  - LawStructureUnit            law_builders/structure_unit/law_structure_unit.py:18-48
  - FoivStructureUnit           law_builders/structure_unit/foiv_structure_unit.py:15-37
  - header/cellar/body/application builders
                                header_builder/header_hierarchy_level_builder.py:13-32,
                                law_builders/cellar_builder.py:13-24,
                                law_builders/body_builder/abstract_body_hierarchy_level_builder.py:39-95,
                                law_builders/application_builder/abstract_application_hierarchy_level_builder.py:26-92
  - roman-prefix fix            abstract_hierarchy_level_builder.py:40-50
  - document model label fix    abstract_law_structure_extractor.py:113-175
  - zone state machine          abstract_law_structure_extractor.py:56-82
  - spaced-word preprocess      abstract_law_structure_extractor.py:84-100
  - prefix-split postprocess    via core/structure.prefix_split_postprocess
                                (law: item/articlePart/subitem regexps,
                                law_structure_excractor.py:39-43; foiv:
                                foiv_law_structure_extractor.py:38-43)
  - law-type routing            classifying_law_structure_extractor.py:10-188
                                (whitespace-spread templates incl. the
                                з→[з3] OCR hot-fix, 3-line batches, the
                                ЗАКОН-vs-КОДЕКС law_matched hack)

The reference predicts line labels (structure_unit / application /
cellar / footer / raw_text) with pickled XGBoost models shipped as
internal artifacts (abstract_law_structure_extractor.py:27-30) — those
are out of scope here, so ``predict_law_labels`` is a deterministic
regex labeler built from the same feature regexps the reference's
feature extractor uses (law_text_features.py:19-27); a trained
broadcast-model replacement can be swapped in via the ``labels``
argument of ``extract_law_structure``.

Determinism deviation: the synthetic "body" line's uid is content-derived
(md5) instead of the reference's uuid1 (CLAUDE.md invariant: no clock, no
uuid).
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence, Tuple

from dedoc_spark.core.model import HierarchyLevel, Line

# --- utils_reg.py port -------------------------------------------------------

regexps_item = re.compile(r"^\s*\d+\.\s")
regexps_foiv_item = re.compile(r"^\s*(\d+\.)+\s*")
regexps_item_with_bracket = re.compile(r"^\s*(\d*\.)*\d+[)}]")
regexps_subitem = re.compile(r"^\s*[а-яё][)}]")
regexps_number = re.compile(r"(^\s*\d{1,2}(\.\d{1,2})*)(\s|$|\)|\}|\.([A-ZА-Яa-zа-яё]|\s))")
regexps_ends_of_number = re.compile(r"([A-ZА-Яa-zа-яё]|\s|( )*)$")
# the reference's single-char confusable set is deliberate (OCR noise):
# Г/T/Т read as I, У as V, П as II, Ш as III — keep verbatim
roman_regexp = re.compile(r"\s*(I|Г|T|Т|II|П|III|Ш|ТУ|TУ|IV|V|У|VI|УТ|УT|VII|УТТ|VIII|I[XХ]|[XХ]|[XХ]I|[XХ]II)\.\s+")

# law_text_features.py:19-27
named_regexp = re.compile(
    r"^(Статья|(Г|г)лава|ГЛАВА|ЧАСТЬ|Часть|Раздел|РАЗДЕЛ|\$|§)\s*((\d+\.*)+|[IVXХxхviУП]{1,3}\.?)\s*"
)
regexp_application_begin = re.compile(
    r"^(\'|\")?(((П|п)риложение)|((У|у)твержден)[оаы]?){1}(( )*([№nN]?( )*(\d){1,3})?( )*)"
    r"((к распоряжению)|(к постановлению)|(к приказу))?\s*$"
)

LAW_EXCEPT_WORDS = {"приказ", "положение", "требования", "постановление", "перечень", "регламент", "закон"}


# --- structure units ---------------------------------------------------------


def law_structure_unit(
    text: str, init_hl_depth: int, previous_hl: Optional[HierarchyLevel]
) -> Tuple[HierarchyLevel, Optional[HierarchyLevel]]:
    """law_structure_unit.py:18-48 (comments incl. the reference's own
    depth numbers)."""
    if text.lower().startswith("часть"):
        hl = HierarchyLevel(init_hl_depth + 1, 0, True, "part")  # 3
        return hl, hl
    if text.lower().startswith("раздел"):
        hl = HierarchyLevel(init_hl_depth + 2, 0, True, "section")  # 4
        return hl, hl
    if roman_regexp.match(text):
        hl = HierarchyLevel(init_hl_depth + 3, 0, True, "subsection")  # 5
        return hl, hl
    if text.lower().startswith("глава"):
        hl = HierarchyLevel(init_hl_depth + 4, 0, True, "chapter")  # 6
        return hl, hl
    if text.lower().startswith("§"):
        hl = HierarchyLevel(init_hl_depth + 5, 0, True, "paragraph")  # 7
        return hl, hl
    if text.lower().startswith("статья"):
        hl = HierarchyLevel(init_hl_depth + 6, 0, True, "article")  # 8
        return hl, hl
    # item is checked BEFORE part: a part does not always contain a dot
    if regexps_item_with_bracket.match(text):
        return HierarchyLevel(init_hl_depth + 8, 0, False, "item"), None  # 10
    if regexps_foiv_item.match(text):
        return HierarchyLevel(init_hl_depth + 7, 0, False, "articlePart"), None  # 9
    if regexps_subitem.match(text):
        return HierarchyLevel(init_hl_depth + 9, 0, False, "subitem"), None  # 11
    if previous_hl is not None:
        return previous_hl, previous_hl
    return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None


def foiv_structure_unit(
    text: str, init_hl_depth: int, previous_hl: Optional[HierarchyLevel]
) -> Tuple[HierarchyLevel, Optional[HierarchyLevel]]:
    """foiv_structure_unit.py:15-37 — level_2 carries the dotted depth."""
    if text.lower().startswith("глава") or roman_regexp.match(text):
        hl = HierarchyLevel(init_hl_depth + 4, 0, True, "chapter")
        return hl, hl
    m = regexps_item_with_bracket.match(text)
    if m:
        nodes = [i for i in text[m.start(): m.end()].split(".") if len(i.strip()) > 0]
        hl = HierarchyLevel(init_hl_depth + 9, len(nodes), False, "subitem")
        return hl, hl
    m = regexps_subitem.match(text)
    if m:
        nodes = [i for i in text[m.start(): m.end()].split(".") if len(i.strip()) > 0]
        hl = HierarchyLevel(init_hl_depth + 10, len(nodes), False, "subitem")
        return hl, hl
    m = regexps_foiv_item.match(text)
    if m:
        nodes = [i for i in text[m.start(): m.end()].split(".") if len(i.strip()) > 0]
        hl = HierarchyLevel(init_hl_depth + 8, len(nodes), False, "item")
        return hl, hl
    if previous_hl is not None:
        return previous_hl, previous_hl
    return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None


_UNITS = {"law": law_structure_unit, "foiv": foiv_structure_unit}


# --- builders ----------------------------------------------------------------


def _postprocess_roman(hl: HierarchyLevel, line: Line) -> None:
    """abstract_hierarchy_level_builder.py:40-50 — normalize the Cyrillic
    OCR confusables of a subsection's roman prefix in place."""
    if hl.line_type == "subsection" and roman_regexp.match(line.line):
        match = roman_regexp.match(line.line)
        prefix = line.line[match.start(): match.end()]
        suffix = line.line[match.end():]
        for symbol_from, symbol_to in [("T", "I"), ("Т", "I"), ("У", "V"), ("П", "II"), ("Ш", "III"), ("Г", "I")]:
            prefix = prefix.replace(symbol_from, symbol_to)
        line.line = prefix + suffix


def _build_header(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int, hl_type: str) -> List[Line]:
    """header_hierarchy_level_builder.py:17-32: every title line is root."""
    result = []
    for line, _label in lines_with_labels:
        hl = HierarchyLevel.create_root()
        _postprocess_roman(hl, line)
        line.hl = hl
        result.append(line)
    return result


def _build_cellar(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int, hl_type: str) -> List[Line]:
    """cellar_builder.py:13-24: one flat multiline 'cellar' level."""
    result = []
    for line, _label in lines_with_labels:
        line.hl = HierarchyLevel(init_hl_depth, 0, True, "cellar")
        result.append(line)
    return result


def _body_line_2level(
    text: str, label: str, init_hl_depth: int, previous_hl: Optional[HierarchyLevel], hl_type: str
) -> Tuple[HierarchyLevel, Optional[HierarchyLevel]]:
    """abstract_body_hierarchy_level_builder.py:68-95."""
    text = text.strip()
    if label == "header":
        label = "raw_text"
    if label in ("application", "raw_text", "cellar") and roman_regexp.match(text):
        label = "structure_unit"
    if label == "structure_unit":
        return _UNITS[hl_type](text, init_hl_depth, previous_hl)
    if label == "footer":
        return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None
    if label == "raw_text":
        if previous_hl is not None and previous_hl.line_type in ("application", "chapter"):
            return previous_hl, previous_hl
        return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None
    if label == "Other":
        return HierarchyLevel(1, 1, False, "Other"), None
    if label == "application":
        return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None
    raise ValueError(f"{text} {label}")


def _synthetic_body_line(init_hl_depth: int) -> Line:
    # reference: uuid1()+"_body" (abstract_body_hierarchy_level_builder.py:31)
    # — uid here is content-derived for determinism (module docstring)
    uid = hashlib.md5(b"law_body_line").hexdigest() + "_body"
    return Line(line="", page_id=0, line_id=0, hl=HierarchyLevel(init_hl_depth, 0, False, "body"), uid=uid)


def _build_body(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int, hl_type: str) -> List[Line]:
    """abstract_body_hierarchy_level_builder.py:39-66: the synthetic
    'body' node precedes the first non-root line; empty lines become
    multiline."""
    result: List[Line] = []
    is_body_begun = False
    previous_hl: Optional[HierarchyLevel] = HierarchyLevel.create_root()
    for line, label in lines_with_labels:
        hierarchy_level, previous_hl = _body_line_2level(line.line, label, init_hl_depth, previous_hl, hl_type)
        _postprocess_roman(hierarchy_level, line)
        hierarchy_level = hierarchy_level.copy()
        if len(line.line.strip()) == 0:
            hierarchy_level.can_be_multiline = True
        if hierarchy_level.line_type != HierarchyLevel.root and not is_body_begun:
            result.append(_synthetic_body_line(init_hl_depth))
            is_body_begun = True
        line.hl = hierarchy_level
        result.append(line)
    if not is_body_begun:
        result.append(_synthetic_body_line(init_hl_depth))
    return result


def _application_line_2level(
    text: str, label: str, init_hl_depth: int, previous_hl: Optional[HierarchyLevel], hl_type: str
) -> Tuple[HierarchyLevel, Optional[HierarchyLevel]]:
    """abstract_application_hierarchy_level_builder.py:60-92."""
    text = text.strip()
    if len(text) == 0:
        label = HierarchyLevel.raw_text
    if label in ("header", "cellar"):
        label = "application"
    if label == "raw_text" and regexp_application_begin.match(text):
        label = "application"
    if (label == "application" or label == "raw_text") and roman_regexp.match(text):
        label = "structure_unit"

    if label == "structure_unit":
        return _UNITS[hl_type](text, init_hl_depth, previous_hl)
    if label == "footer":
        return HierarchyLevel(None, None, False, HierarchyLevel.raw_text), None
    if label == "raw_text" and previous_hl is not None and previous_hl.line_type == "chapter":
        return previous_hl, previous_hl
    if label == "raw_text" and previous_hl is None:
        return HierarchyLevel.create_raw_text(), None
    if label == "Other":
        return HierarchyLevel(1, 1, False, "Other"), None
    if label in ("application", "header", "raw_text"):
        application_continue = (
            label == "raw_text" and previous_hl is not None and previous_hl.line_type == "application"
        )
        if label == "application" or application_continue:
            hl = HierarchyLevel(init_hl_depth, 0, True, "application")
            return hl, hl
        return HierarchyLevel.create_raw_text(), None
    raise ValueError(f"{text} {label}")


def _build_application(lines_with_labels: List[Tuple[Line, str]], init_hl_depth: int, hl_type: str) -> List[Line]:
    """abstract_application_hierarchy_level_builder.py:26-58, incl. the
    multiple-application postprocess (consecutive begin-lines merge) and
    the first-line can_be_multiline=False reset."""
    if len(lines_with_labels) == 0:
        return []
    result: List[Line] = []
    previous_hl: Optional[HierarchyLevel] = HierarchyLevel(init_hl_depth, 0, True, "application")
    lines_with_labels[0] = (lines_with_labels[0][0], "application")
    previous_line_start_of_application = False
    for line_id, (line, label) in enumerate(lines_with_labels):
        hierarchy_level, previous_hl = _application_line_2level(
            line.line, label, init_hl_depth, previous_hl, hl_type
        )
        if regexp_application_begin.match(line.line.strip().lower()):
            # NOTE reference-faithful aliasing: when _line_2level returned
            # the SHARED previous_hl object, this mutation lands on it
            # before the copy below — exactly the reference's order
            # (abstract_application_hierarchy_level_builder.py:41-52, where
            # deepcopy also happens after this postprocess). Also faithful:
            # _line_2level matches the regexp against NON-lowercased text
            # (:66) while this check lowercases (:41).
            hierarchy_level.can_be_multiline = previous_line_start_of_application
            previous_line_start_of_application = True
        elif line.line.strip() != "":
            previous_line_start_of_application = False
        _postprocess_roman(hierarchy_level, line)
        hierarchy_level = hierarchy_level.copy()
        if line_id == 0:
            hierarchy_level.can_be_multiline = False
        line.hl = hierarchy_level
        result.append(line)
    return result


# --- label model -------------------------------------------------------------

_CELLAR_RE = re.compile(
    r"^\s*(Президент|Председатель|Министр|Мэр|Губернатор|Врио|Москва, Кремль)", re.IGNORECASE
)


def predict_law_labels(lines: Sequence[Line]) -> List[str]:
    """Deterministic stand-in for the pickled XGBoost line classifier
    (see module docstring): labels from the reference's OWN feature
    regexps — named headers and numbered items → structure_unit,
    application-begin phrasing → application, signature block → cellar."""
    labels = []
    for ln in lines:
        text = ln.line.strip()
        if regexp_application_begin.match(text.lower()):
            labels.append("application")
        elif (
            named_regexp.match(text)
            or regexps_item_with_bracket.match(text)
            or regexps_foiv_item.match(text)
            or regexps_subitem.match(text)
        ):
            labels.append("structure_unit")
        elif _CELLAR_RE.match(text):
            labels.append("cellar")
        else:
            labels.append("raw_text")
    return labels


def fix_labels(labels: List[str]) -> List[str]:
    """abstract_law_structure_extractor.py:113-175 — clamp predictions to
    the law document model (title → body → cellar? → application)."""
    title_end = None
    application_start = None
    last_body_unit = None
    for index, label in enumerate(labels):
        if title_end is None and label in ("structure_unit", "cellar", "application"):
            title_end = index
        if application_start is None and label == "application":
            application_start = index
        if application_start is None and label == "structure_unit":
            last_body_unit = index
    if title_end is None:
        title_end = len(labels)
    if application_start is None:
        application_start = len(labels)
    if last_body_unit is None:
        last_body_unit = title_end

    result = []
    for index, label in enumerate(labels):
        if label == "footer":
            result.append(label)
        elif index < title_end:
            result.append("title")
        elif title_end <= index < last_body_unit:
            result.append("raw_text" if label in ("cellar", "title") else label)
        elif last_body_unit <= index < application_start:
            result.append("raw_text" if label == "title" else label)
        else:
            result.append("raw_text" if label in ("cellar", "title") else label)
    return result


def preprocess_spaced_words(lines: List[Line]) -> List[Line]:
    """abstract_law_structure_extractor.py:84-100: a line of single
    letters whose joined word is one of the law keywords ("П Р И К А З")
    is collapsed to the word + newline."""
    fixed = []
    for line in lines:
        words = [w for w in line.line.split() if w.isalnum()]
        if words and max(len(w) for w in words) == 1:
            word = "".join(words)
            if word.lower() in LAW_EXCEPT_WORDS:
                line.line = word + "\n"
        fixed.append(line)
    return fixed


# --- main entry --------------------------------------------------------------


def extract_law_structure(
    lines: List[Line], hl_type: str = "law", labels: Optional[List[str]] = None,
    labeler=None,
) -> List[Line]:
    """Zone split + builders + prefix-split postprocess
    (abstract_law_structure_extractor.py:56-82 + the concrete extractors'
    _postprocess_lines). ``hl_type``: "law" | "foiv". ``labeler`` swaps
    the regex stand-in for a callable (e.g. operators/line_labeler's
    trained model); explicit ``labels`` win over both."""
    from dedoc_spark.core.structure import prefix_split_postprocess

    lines = preprocess_spaced_words(lines)
    if labels is None:
        labels = (labeler or predict_law_labels)(lines)
    labels = fix_labels(labels)

    header_lines: List[Tuple[Line, str]] = []
    body_lines: List[Tuple[Line, str]] = []
    applications_lines: List[Tuple[Line, str]] = []
    cellar_lines: List[Tuple[Line, str]] = []
    is_body_begun = is_application_begun = is_cellar_begun = False
    for line, label in zip(lines, labels):
        if label == "structure_unit":
            is_body_begun = True
        elif label == "cellar":
            is_cellar_begun = True
        elif label == "application":
            is_application_begun = True
        if is_cellar_begun and not is_application_begun:
            cellar_lines.append((line, label))
        elif is_application_begun:
            applications_lines.append((line, label))
        elif is_body_begun:
            body_lines.append((line, label))
        else:
            header_lines.append((line, label))

    init_hl_depth = 2
    out = (
        _build_header(header_lines, init_hl_depth, hl_type)
        + _build_body(body_lines, init_hl_depth, hl_type)
        + _build_cellar(cellar_lines, init_hl_depth, hl_type)
        + _build_application(applications_lines, init_hl_depth, hl_type)
    )
    if hl_type == "law":
        # law_structure_excractor.py:39-43
        item_re = re.compile(r"^\s*(\d*\.)*\d+[\)|\}]")
        subitem_re = re.compile(r"^\s*[а-яё]\)")
        return prefix_split_postprocess(
            out,
            ["item", "articlePart", "subitem"],
            [item_re, regexps_number, subitem_re],
            [None, regexps_ends_of_number, regexps_ends_of_number],
        )
    # foiv_law_structure_extractor.py:38-43
    return prefix_split_postprocess(
        out,
        ["item", "subitem", "subitem"],
        [regexps_foiv_item, regexps_item_with_bracket, regexps_subitem],
        [None, regexps_ends_of_number, None],
    )


# --- law-type routing --------------------------------------------------------

_FOIV_TYPES = ("приказ", "положение", "инструкция")
# order matters (classifying_law_structure_extractor.py:26-40)
_DOC_TYPE_ORDER = (
    "определение", "приказ", "распоряжение", "кодекс", "федеральный закон",
    "указ", "закон", "постановление", "директива", "конституция",
    "положение", "инструкция",
)


def _ws_template(word: str, char_map: Optional[dict] = None) -> str:
    chars = (char_map.get(c, c) if char_map else c for c in word)
    return r"\s*".join(chars)


_MAIN_TEMPLATES = {
    t: _ws_template(t, {"з": "[з3]"} if t == "приказ" else None) for t in _DOC_TYPE_ORDER
}

_BAD_CHARACTERS = {
    "\u0438\u0306": "\u0439",  # и + combining breve -> й
    "\u0439\u0306": "\u0439",
    "\u0418\u0306": "\u0419",
    "\u0419\u0306": "\u0419",
}


def classify_law_type(lines: Sequence[str], batch_size: int = 3, batch_count: int = 7) -> Optional[str]:
    """classifying_law_structure_extractor.py:105-188: round-robin type
    search over 3-line batches of the document hat; returns the matched
    doc type string or None."""
    batch_lines: List[List[str]] = []
    cur_batch: List[str] = []
    cur_batches_count = 0
    for line in lines:
        if line.strip():
            clean = line
            for bad, good in _BAD_CHARACTERS.items():
                clean = clean.replace(bad, good)
            clean = clean.strip()
            if len(cur_batch) < batch_size:
                cur_batch.append(clean)
            else:
                batch_lines.append(cur_batch)
                cur_batch = [clean]
                cur_batches_count += 1
        if cur_batches_count > batch_count:
            break
    if cur_batch:
        batch_lines.append(cur_batch)

    law_matched = False
    for batch in batch_lines:
        for doc_type in _DOC_TYPE_ORDER:
            template = _MAIN_TEMPLATES[doc_type]
            for line in batch:
                if re.fullmatch(r"[\s\w-]*" + rf"\b{template}\b" + r"[()/\.№\s\w-]*", line, re.IGNORECASE):
                    if doc_type == "закон":
                        law_matched = True  # ЗАКОН may precede КОДЕКС
                    else:
                        return doc_type
    if law_matched:
        return "закон"
    return None


def route_law_extractor(lines: Sequence[str]) -> str:
    """Doc-type → extractor family ("law" | "foiv"), the
    __get_extractor_by_type routing (foiv types: приказ, положение,
    инструкция; unknown → base law)."""
    doc_type = classify_law_type(lines)
    if doc_type in _FOIV_TYPES:
        return "foiv"
    return "law"
