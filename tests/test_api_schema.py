"""ParsedDocument serialization parity: key sets must equal the reference's
pydantic schema fields (api/schema/*.py) at every level."""

from dedoc_spark.core.api_schema import to_parsed_document
from dedoc_spark.core.document import extract_document

HTML = b'<html><body><h1>Title</h1><p>Body text</p><table border="1"><tr><td>A</td><td>B</td></tr></table></body></html>'


def _doc():
    return to_parsed_document(
        extract_document("https://x/page.html", HTML, None),
        metadata={"size": 123, "file_type": "text/html"},
    )


def test_parsed_document_keys():
    d = _doc()
    assert set(d) == {"content", "metadata", "version", "warnings", "attachments"}
    assert set(d["content"]) == {"structure", "tables"}
    assert isinstance(d["attachments"], list) and isinstance(d["warnings"], list)
    assert d["metadata"]["size"] == 123
    for key in ("file_name", "file_type", "size", "modified_time", "created_time", "access_time"):
        assert key in d["metadata"]  # DocumentMetadata base fields


def test_tree_node_keys_recursive():
    def check(node):
        assert set(node) == {"node_id", "text", "annotations", "metadata", "subparagraphs"}
        assert {"paragraph_type", "page_id", "line_id"} <= set(node["metadata"])
        for a in node["annotations"]:
            assert set(a) == {"start", "end", "name", "value"}
        for sub in node["subparagraphs"]:
            check(sub)

    check(_doc()["content"]["structure"])


def test_table_schema_keys():
    d = _doc()
    assert d["content"]["tables"], "fixture html must produce a table"
    t = d["content"]["tables"][0]
    assert set(t) == {"cells", "metadata"}
    assert set(t["metadata"]) == {"page_id", "uid", "rotated_angle", "title"}
    cell = t["cells"][0][0]
    assert set(cell) == {"lines", "rowspan", "colspan", "invisible"}
    line = cell["lines"][0]
    assert set(line) == {"text", "annotations"}  # LineWithMeta api shape
    assert line["text"] == "A"
