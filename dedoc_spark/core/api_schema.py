"""ParsedDocument serialization parity with the reference's API schema.

Produces the exact model_dump key shape of dedoc's pydantic models
(api/schema/parsed_document.py, document_content.py, tree_node.py,
annotation.py, line_metadata.py, table.py, cell_with_meta.py,
table_metadata.py, line_with_meta.py) from an extraction-row dict, so a
consumer of the reference's /upload JSON can read this engine's output
unchanged. Pure Python — usable inside mapInPandas or driver-side.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

VERSION = "2.0.0-spark"


def _cell_to_api(cell: Dict) -> Dict:
    # CellWithMeta: lines (LineWithMeta = text + annotations), spans, invisible
    return {
        "lines": [
            {"text": ln["line"], "annotations": ln["annotations"]} for ln in cell["lines"]
        ],
        "rowspan": cell["rowspan"],
        "colspan": cell["colspan"],
        "invisible": cell["invisible"],
    }


def _table_to_api(table: Dict) -> Dict:
    # Table: cells + TableMetadata (page_id, uid, rotated_angle, title)
    return {
        "cells": [[_cell_to_api(c) for c in row] for row in table["cells"]],
        "metadata": {
            "page_id": table["page_id"],
            "uid": table["uid"],
            "rotated_angle": 0.0,  # no image rotation path (OCR de-scoped)
            "title": table.get("title", ""),
        },
    }


def to_parsed_document(row: Dict, metadata: Optional[Dict] = None) -> Dict:
    """Extraction-row dict (extract_document output) → ParsedDocument dict.

    ``metadata`` carries the input-table fields (file_name, size, …) the
    reference reads from os.stat — DocumentMetadata allows extra keys
    (document_metadata.py Config.extra = allow)."""
    structure = json.loads(row["tree_json"]) if row.get("tree_json") else {}
    tables: List[Dict] = json.loads(row.get("tables_json") or "[]")
    meta = {"file_name": row.get("url", ""), "file_type": "", "size": 0,
            "modified_time": 0, "created_time": 0, "access_time": 0}
    meta.update(metadata or {})
    return {
        "content": {
            "structure": structure,
            "tables": [_table_to_api(t) for t in tables],
        },
        "metadata": meta,
        "version": VERSION,
        "warnings": list(row.get("warnings") or []),
        "attachments": [],
    }
