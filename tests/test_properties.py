"""Property-based invariants (hypothesis) — robustness beyond the
reference's example-based suite."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dedoc_spark.core.annotation_merger import merge_annotations
from dedoc_spark.core.document import extract_document
from dedoc_spark.core.model import Annotation, Line
from dedoc_spark.core.structure import assign_hierarchy_levels
from dedoc_spark.core.tree import construct_tree, tree_to_text

annotations_st = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.integers(0, 50),
        st.sampled_from(["bold", "italic", "size"]),
        st.sampled_from(["True", "10", "12"]),
    ).map(lambda t: Annotation(min(t[0], t[1]), max(t[0], t[1]), t[2], t[3])),
    max_size=12,
)


@given(annotations_st, st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_merger_output_within_bounds_and_non_overlapping(anns, text):
    merged = merge_annotations(anns, text)
    by_name = {}
    for a in merged:
        assert a.start <= a.end
        by_name.setdefault(a.name, []).append(a)
    # per name: non-overlapping after the contradiction filter
    for group in by_name.values():
        group.sort(key=lambda a: a.start)
        for prev, nxt in zip(group, group[1:]):
            assert nxt.start >= prev.end


@given(annotations_st, st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_merger_idempotent(anns, text):
    # The reference AnnotationMerger (dedoc/utils/annotation_merger.py) is not
    # order-idempotent for degenerate zero-width spans at tied starts: the
    # winner among same-name-different-value groups follows dict insertion
    # order of (name, value) groups, which changes between passes. We
    # reproduce that behavior for byte parity, so idempotence is asserted as
    # a multiset (same spans, order-insensitive).
    once = merge_annotations(anns, text)
    twice = merge_annotations(list(once), text)
    assert sorted((a.start, a.end, a.name, a.value) for a in once) == sorted(
        (a.start, a.end, a.name, a.value) for a in twice
    )


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_line_concat_preserves_text_and_spans(t1, t2):
    a = Line(line=t1, annotations=[Annotation(0, len(t1), "bold", "True")] if t1 else [])
    b = Line(line=t2, annotations=[Annotation(0, len(t2), "italic", "True")] if t2 else [])
    c = a.concat(b)
    assert c.line == t1 + t2
    for ann in c.annotations:
        assert 0 <= ann.start <= ann.end <= len(c.line)


@given(st.binary(max_size=2000))
@settings(max_examples=150, deadline=None)
def test_extract_never_raises_on_arbitrary_bytes(payload):
    d = extract_document("https://fuzz.example/x", payload, None)
    assert set(d) == {
        "url", "text_extracted", "text_linear", "n_lines", "n_tables",
        "lines_json", "tree_json", "nodes_json", "tables_json", "warnings", "error",
    }


@given(st.text(max_size=1500))
@settings(max_examples=150, deadline=None)
def test_extract_deterministic_on_arbitrary_text(text):
    d1 = extract_document("https://fuzz.example/t", None, text)
    d2 = extract_document("https://fuzz.example/t", None, text)
    assert d1 == d2


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_tree_contains_all_line_text(texts):
    lines = [Line(line=t, line_id=i) for i, t in enumerate(texts)]
    assign_hierarchy_levels(lines)
    root = construct_tree(lines)
    rendered = tree_to_text(root)
    total_line_chars = sum(len(t) for t in texts)
    # every character of every line survives into the rendered tree text
    assert sum(len(n) for n in rendered.split("\n")) >= total_line_chars - rendered.count("\n")
    for t in texts:
        if "\n" not in t:
            assert t in rendered


@given(st.integers(0, 10_000), st.integers(0, 255), st.sampled_from(["xls", "doc", "ppt", "rtf", "odt", "zip"]))
@settings(max_examples=120, deadline=None)
def test_mutated_binary_payloads_never_raise(pos, byte, kind):
    """Single-byte mutations of valid legacy-format payloads must land in
    the error channel, never raise: the per-row parsers are fed hostile
    bytes at corpus scale."""
    from dedoc_spark.sources.office_fixture import build_doc, build_ppt, build_xls

    import io
    import zipfile

    if kind == "xls":
        payload = bytearray(build_xls([[["a", 1], ["b", 2]]]))
    elif kind == "doc":
        payload = bytearray(build_doc(["first paragraph", "second"]))
    elif kind == "ppt":
        payload = bytearray(build_ppt(["slide text"]))
    elif kind == "rtf":
        payload = bytearray(b"{\\rtf1\\ansi Hello \\b world\\b0\\par \\u1055? text\\par}")
    elif kind == "odt":
        from dedoc_spark.sources.office_fixture import build_odt

        payload = bytearray(build_odt([("h", 1, "T"), ("p", "body")]))
    else:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("a.html", "<p>x</p>")
        payload = bytearray(buf.getvalue())
    payload[pos % len(payload)] = byte
    d = extract_document(f"https://fuzz.example/f.{kind}", bytes(payload), None)
    assert set(d) == {
        "url", "text_extracted", "text_linear", "n_lines", "n_tables",
        "lines_json", "tree_json", "nodes_json", "tables_json", "warnings", "error",
    }
