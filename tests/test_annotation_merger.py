"""Ports of the reference annotation-merge semantics tests
(tests/unit_tests/test_misc_annotations.py shape): merge through spaces,
contradiction filtering, non-mergeable passthrough."""

from dedoc_spark.core.annotation_merger import merge_annotations
from dedoc_spark.core.model import Annotation


def ann(start, end, name="bold", value="True"):
    return Annotation(start, end, name, value)


def spans(annotations):
    return sorted((a.start, a.end, a.name, a.value) for a in annotations)


def test_merge_adjacent_same_value():
    text = "abcdef"
    result = merge_annotations([ann(0, 3), ann(3, 6)], text)
    assert spans(result) == [(0, 6, "bold", "True")]


def test_merge_overlapping_same_value():
    text = "abcdef"
    result = merge_annotations([ann(0, 4), ann(2, 6)], text)
    assert spans(result) == [(0, 6, "bold", "True")]


def test_merge_through_spaces():
    # annotations separated by whitespace-only text glue together
    text = "word   word"
    result = merge_annotations([ann(0, 4), ann(7, 11)], text)
    assert spans(result) == [(0, 11, "bold", "True")]


def test_no_merge_through_text():
    text = "word x word"
    result = merge_annotations([ann(0, 4), ann(7, 11)], text)
    assert spans(result) == [(0, 4, "bold", "True"), (7, 11, "bold", "True")]


def test_different_values_not_merged_but_filtered():
    # same name, different value, overlapping: contradiction filter keeps
    # first-by-start (annotation_merger.py:124-145)
    text = "abcdef"
    result = merge_annotations(
        [ann(0, 4, "size", "12"), ann(2, 6, "size", "14")], text
    )
    assert spans(result) == [(0, 4, "size", "12")]


def test_space_only_span_replaceable():
    # kept annotation covering only whitespace is replaced by the next
    text = "   abc"
    result = merge_annotations(
        [ann(0, 3, "size", "12"), ann(1, 6, "size", "14")], text
    )
    assert spans(result) == [(1, 6, "size", "14")]


def test_non_mergeable_passthrough():
    text = "link link"
    result = merge_annotations(
        [ann(0, 4, "linked_text", "http://a"), ann(5, 9, "linked_text", "http://a")], text
    )
    assert spans(result) == [
        (0, 4, "linked_text", "http://a"),
        (5, 9, "linked_text", "http://a"),
    ]


def test_different_names_independent():
    text = "abcdef"
    result = merge_annotations([ann(0, 3, "bold"), ann(3, 6, "italic")], text)
    assert spans(result) == [(0, 3, "bold", "True"), (3, 6, "italic", "True")]


def test_empty():
    assert merge_annotations([], "abc") == []
