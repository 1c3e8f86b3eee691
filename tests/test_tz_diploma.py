"""TZ + diploma structure extractors and the shared TOC heuristic
(core/tz_diploma.py, core/toc.py)."""

import json

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.model import Annotation, HierarchyLevel, Line
from dedoc_spark.core.toc import TocItem, build_toc, get_toc
from dedoc_spark.core.tz_diploma import (
    _replace_footnote_lines,
    extract_diploma_structure,
    extract_tz_structure,
    predict_diploma_labels,
)
from dedoc_spark.core.txt_extract import extract_txt_lines


def _toc_doc(n_items=8, start_page=2, n_body=8):
    # a real document follows its TOC — the heuristic force-drops the last
    # window_size lines, so the body tail is required (toc_feature_extractor)
    lines = [Line(line="Содержание", line_id=0)]
    for i in range(n_items):
        lines.append(
            Line(line=f"Раздел {i + 1} Описание части .......... {start_page + i}", line_id=i + 1)
        )
    for j in range(n_body):
        lines.append(Line(line="обычный текст тела документа строка " + "я" * (j + 1), line_id=n_items + 1 + j))
    return lines


def test_get_toc_finds_long_ordered_toc():
    toc = get_toc(_toc_doc())
    assert len(toc) == 8
    assert [t.page for t in toc] == [2, 3, 4, 5, 6, 7, 8, 9]


def test_get_toc_rejects_short_and_unordered():
    assert get_toc(_toc_doc(n_items=4)) == []  # ≤ 6 items
    bad = _toc_doc()
    bad[3].line = "Раздел 3 Описание части .......... 1"  # page goes backwards
    assert get_toc(bad) == []


def test_toc_multiline_merge():
    lines = [Line(line="Содержание", line_id=0)]
    texts = [
        "Раздел 1 Первое .......... 2",
        "Раздел 2 Короткое .......... 3",
        "Раздел 3 Очень длинное название",  # no page number → continuation head
        "которое продолжается .......... 4",
        "Раздел 4 Четвертое .......... 5",
        "Раздел 5 Пятое .......... 6",
        "Раздел 6 Шестое .......... 7",
        "Раздел 7 Седьмое .......... 8",
    ]
    for i, t in enumerate(texts):
        lines.append(Line(line=t, line_id=i + 1))
    for j in range(8):
        lines.append(Line(line="текст тела строка " + "я" * (j + 1), line_id=len(texts) + 1 + j))
    toc = get_toc(lines)
    assert len(toc) == 7
    merged = next(t for t in toc if "Очень длинное название" in t.line.line)
    assert "которое продолжается" in merged.line.line and merged.page == 4


def test_build_toc_synthetic_title():
    # no title line in the chunk → a synthetic empty 'toc' line is inserted
    out = build_toc([(Line(line="Item .......... 2", uid="u1"), "toc")], init_hl_depth=1)
    assert out[0].line == "" and out[0].hl.line_type == "toc" and out[0].uid == "u1_toc"
    assert out[1].hl.line_type == "toc_item" and out[1].hl.level_1 == 2


TZ_TEXT = "\n".join(
    [
        "ТЕХНИЧЕСКОЕ ЗАДАНИЕ",
        "Содержание",
        "Раздел 1 Общие сведения .......... 2",
        "Раздел 2 Назначение .......... 3",
        "Раздел 1 Общие сведения",
        "1.1 Полное наименование системы",
        "наименование определяется заказчиком",
        "- первый пункт списка",
    ]
)


def test_tz_zones_and_levels():
    out = extract_tz_structure(extract_txt_lines(TZ_TEXT))
    by_type = {}
    for ln in out:
        by_type.setdefault(ln.hl.line_type, []).append(ln)
    assert [l.line.strip() for l in by_type["root"]] == ["ТЕХНИЧЕСКОЕ ЗАДАНИЕ"]
    assert [l.line.strip() for l in by_type["toc"]] == ["Содержание"]
    assert len(by_type["toc_item"]) == 2
    assert "body" in by_type
    items = {l.line.strip(): l.hl for l in by_type["item"]}
    # named раздел item: item_min_depth(6) + 2 = 8; dotted number: 9 with
    # the dot count in level_2; bullet: 10 (tz body_builder.py:40-56)
    assert items["Раздел 1 Общие сведения"].level_1 == 8
    assert items["1.1"].level_1 == 9 and items["1.1"].level_2 == 2
    assert items["-"].level_1 == 10
    # prefix-split: the number went to its own line, the rest is raw_text
    assert any("Полное наименование" in l.line for l in by_type["raw_text"])


def test_tz_subsection_level():
    out = extract_tz_structure(extract_txt_lines("Подраздел 1.1 Детали"))
    item = next(ln for ln in out if ln.hl.line_type == "item")
    assert item.hl.level_1 == 8 and item.hl.level_2 == 1  # подраздел → level_2=1


DIPLOMA_TEXT = "\n".join(
    [
        "ДИПЛОМНАЯ РАБОТА",
        "СОДЕРЖАНИЕ",
        "Введение .......... 3",
        "Глава 1 Обзор .......... 5",
        "1.1 Постановка .......... 6",
        "1.2 Методы .......... 9",
        "Глава 2 Эксперименты .......... 12",
        "2.1 Датасет .......... 13",
        "Заключение .......... 20",
        "Список литературы .......... 22",
        "Введение",
        "текст введения",
        "Глава 1 Обзор",
        "1) первый пункт",
        "а) подпункт",
        "- буллет",
        "Заключение",
        "итоги",
    ]
)


def test_diploma_structure():
    out = extract_diploma_structure(extract_txt_lines(DIPLOMA_TEXT))
    by_type = {}
    for ln in out:
        by_type.setdefault(ln.hl.line_type, []).append(ln)
    assert [l.line.strip() for l in by_type["root"]] == ["ДИПЛОМНАЯ РАБОТА"]
    assert [l.line.strip() for l in by_type["toc"]] == ["СОДЕРЖАНИЕ"]
    assert len(by_type["toc_item"]) == 8
    named = [l.line.strip() for l in by_type["named_item"]]
    assert named == ["Введение", "Глава 1 Обзор", "Заключение"]
    # pattern levels anchored at the previous named item (bracket 3,
    # letter 4, bullet 5 — diploma_builder/body_builder.py:22-31)
    lvls = {l.line.strip(): l.hl.level_1 for l in by_type["list_item"]}
    assert lvls == {"1) первый пункт": 3, "а) подпункт": 4, "- буллет": 5}


def test_diploma_bold_named_item_promotion():
    # a BOLD raw-text line starting with a named keyword → named_item
    ln = Line(line="Глава 3 Дополнение")
    ln.annotations.append(Annotation(0, len(ln.line), "bold", "True"))
    labels = predict_diploma_labels([ln])
    assert labels == ["named_item"]
    from dedoc_spark.core.tz_diploma import _diploma_postprocess_raw_text

    out = _diploma_postprocess_raw_text(ln, 1)
    assert out.hl is not None and out.hl.line_type == "named_item"


def test_footnote_merge():
    def fl(text):
        ln = Line(line=text)
        ln.tag_hl = HierarchyLevel(None, None, True, "footnote")
        return ln

    lines = [
        Line(line="обычная строка"),
        fl("1 сноска первая "),
        fl("продолжение сноски"),
        fl("2 сноска вторая"),
        Line(line="снова текст"),
    ]
    out = _replace_footnote_lines(lines)
    notes = [ln.line for ln in out if ln.tag_hl.line_type == "footnote"]
    assert notes == ["1 сноска первая продолжение сноски", "2 сноска вторая"]
    assert len(out) == 4


def test_document_type_params():
    d = extract_document("tz.txt", TZ_TEXT.encode(), None, params={"document_type": "tz"})
    assert d["error"] is None
    types = {ln["hl"]["line_type"] for ln in json.loads(d["lines_json"])}
    assert {"root", "toc", "toc_item", "body", "item"} <= types
    d = extract_document(
        "dip.txt", DIPLOMA_TEXT.encode(), None, params={"document_type": "diploma"}
    )
    assert d["error"] is None
    types = {ln["hl"]["line_type"] for ln in json.loads(d["lines_json"])}
    assert {"root", "toc", "toc_item", "named_item", "list_item"} <= types


def test_fintoc_structure():
    """FinTOC contract (fintoc_structure_extractor.py:60-77): TOC-matched
    lines become headers with the TOC depth in level_2, everything else
    raw_text; whitespace-only lines and private-use bullets are filtered."""
    from dedoc_spark.core.fintoc import extract_fintoc_structure, filter_lines

    body = [
        "PROSPECTUS", "CONTENTS",
        "1 Risk Factors .......... 4",
        "2 Use of Proceeds .......... 9",
        "2.1 General Allocation .......... 10",
        "3 Dividend Policy .......... 14",
        "4 Capitalisation .......... 20",
        "5 Selected Financials .......... 25",
        "6 Business Overview .......... 30",
        "1 Risk Factors",
        "ordinary prose about risks",
        "2.1 General Allocation",
        "more ordinary prose body",
        "closing ordinary prose line",
        "final ordinary prose words",
    ]
    lines = extract_txt_lines("\n".join(body))
    out = extract_fintoc_structure(lines, {"language": "eng"})
    headers = {ln.line.strip(): ln.hl.level_2 for ln in out if ln.hl.line_type == "header"}
    assert headers.get("1 Risk Factors") == 1
    assert headers.get("2.1 General Allocation") == 2  # dotted depth
    assert all(
        ln.hl.line_type in ("header", "raw_text") for ln in out
    )
    # filtering: blank lines and bullets glyphs removed
    glyph = Line(line=" bullet item")
    blank = Line(line="   \n")
    kept = filter_lines([glyph, blank])
    assert len(kept) == 1 and kept[0].line == " bullet item"


def test_fintoc_no_toc_all_raw():
    from dedoc_spark.core.fintoc import extract_fintoc_structure

    out = extract_fintoc_structure(extract_txt_lines("short doc\nno toc here"))
    assert all(ln.hl.line_type == "raw_text" for ln in out)


def test_fintoc_document_type_param():
    from dedoc_spark.core.document import extract_document

    d = extract_document("f.txt", b"plain line one\nplain line two", None,
                         params={"document_type": "fintoc"})
    assert d["error"] is None and d["n_lines"] == 2


def test_diploma_multiline_last_toc_item_not_duplicated():
    """When the LAST TOC entry wraps onto a continuation line, the excised
    range must cover the closing component — otherwise its text appears
    both inside the merged item and again as a body line."""
    from dedoc_spark.core.tz_diploma import _replace_toc_lines

    lines = extract_txt_lines(
        "\n".join(
            [
                "СОДЕРЖАНИЕ",
                "Введение .......... 3",
                "Глава 1 Обзор .......... 5",
                "1.1 Постановка .......... 6",
                "1.2 Методы .......... 9",
                "Глава 2 Эксперименты .......... 12",
                "2.1 Датасет .......... 13",
                "Приложение А Материалы",  # wraps — no page number
                "эксперимента .......... 43",
                "Введение",
                "текст введения обычный",
                "далее текст без номеров",
                "и ещё обычные строки",
                "и последняя строка текста",
            ]
        )
    )
    out = _replace_toc_lines(lines)
    texts = [ln.line for ln in out]
    # the continuation text appears exactly once (inside the merged item)
    assert sum("эксперимента" in t for t in texts) == 1
    merged = next(t for t in texts if "Материалы" in t)
    assert "эксперимента" in merged
