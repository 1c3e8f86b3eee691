"""Tree construction and plain-text rendering.

Reference: dedoc/structure_constructors/concrete_structure_constructors/
tree_constructor.py:31-102, dedoc/data_structures/tree_node.py:58-139,
dedoc/api/api_utils.py:271-274 (json2txt).

Reproduced behaviors:
  - lines with hierarchy level exactly (0, 0) are concatenated into the
    root node text (document name);
  - a synthetic empty node of type "list" with level_2 - 0.5 is inserted
    before the first list item of a run (tree_constructor.py:73-102);
  - stack machine: equal-HL multiline same-type lines merge into the node
    (annotations shifted), otherwise pop while tree.hl >= line.hl and add
    a child; node_id is the dotted path f"{parent}.{index}";
  - annotation merge applied to every node post-construction;
  - json2txt: text = f"{node.text}\\n{join(children)}" (recursive), which
    *is* the per-url extracted-text definition for byte identity.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from dedoc_spark.core.annotation_merger import merge_annotations
from dedoc_spark.core.model import Annotation, HierarchyLevel, Line


class TreeNode:
    __slots__ = ("node_id", "text", "annotations", "hl", "page_id", "line_id", "subparagraphs", "parent")

    def __init__(
        self,
        node_id: str,
        text: str,
        annotations: List[Annotation],
        hl: HierarchyLevel,
        page_id: int,
        line_id: Optional[int],
        parent: Optional["TreeNode"],
    ) -> None:
        self.node_id = node_id
        self.text = text
        self.annotations = annotations
        self.hl = hl
        self.page_id = page_id
        self.line_id = line_id
        self.subparagraphs: List["TreeNode"] = []
        self.parent = parent

    def add_child(self, line: Line) -> "TreeNode":
        node = TreeNode(
            node_id=f"{self.node_id}.{len(self.subparagraphs)}",
            text=line.line,
            annotations=list(line.annotations),
            hl=line.hl,
            page_id=line.page_id,
            line_id=line.line_id,
            parent=self,
        )
        self.subparagraphs.append(node)
        return node

    def add_text(self, line: Line) -> None:
        shift = len(self.text)
        self.annotations.extend(
            Annotation(a.start + shift, a.end + shift, a.name, a.value) for a in line.annotations
        )
        self.text += line.line

    def to_dict(self) -> Dict:
        return {
            "node_id": self.node_id,
            "text": self.text,
            "annotations": [a.to_dict() for a in self.annotations],
            "metadata": {
                "paragraph_type": self.hl.line_type if self.hl is not None else HierarchyLevel.raw_text,
                "page_id": self.page_id,
                "line_id": self.line_id,
            },
            "subparagraphs": [c.to_dict() for c in self.subparagraphs],
        }


def construct_tree(lines: List[Line]) -> TreeNode:
    """Build the document tree from structure-extracted lines."""
    document_name = [
        line for line in lines if line.hl.level_1 == 0 and line.hl.level_2 == 0
    ]
    rest = [line for line in lines if not (line.hl.level_1 == 0 and line.hl.level_2 == 0)]
    rest = _add_list_nodes(rest)

    root = _create_root(document_name)
    tree = root
    for line in rest:
        hl_equal = line.hl == tree.hl
        type_equal = line.hl.line_type == tree.hl.line_type
        if line.hl.can_be_multiline and hl_equal and type_equal:
            tree.add_text(line)
        else:
            while tree.hl >= line.hl:
                tree = tree.parent
            tree = tree.add_child(line)
    root = tree
    while root.parent is not None:
        root = root.parent
    _merge_tree_annotations(root)
    return root


def _create_root(lines: List[Line]) -> TreeNode:
    page_id = 0 if not lines else min(line.page_id for line in lines)
    line_id = 0 if not lines else min(line.line_id for line in lines)
    root = TreeNode(
        node_id="0",
        text="",
        annotations=[],
        hl=HierarchyLevel.create_root(),
        page_id=page_id,
        line_id=line_id,
        parent=None,
    )
    text_length = 0
    parts: List[str] = []
    for line in lines:
        root.annotations.extend(
            Annotation(a.start + text_length, a.end + text_length, a.name, a.value)
            for a in line.annotations
        )
        text_length += len(line.line)
        parts.append(line.line)
    root.text = "".join(parts)
    return root


def _add_list_nodes(lines: List[Line]) -> List[Line]:
    """Insert synthetic empty "list" lines (level_2 - 0.5) before the first
    list item of each run (tree_constructor.py:73-102)."""
    previous_levels: List[HierarchyLevel] = []
    res: List[Line] = []
    for line in lines:
        if line.hl.is_list_item():
            while previous_levels and previous_levels[-1] > line.hl:
                previous_levels.pop()
            if not previous_levels or previous_levels[-1] < line.hl:
                list_hl = HierarchyLevel(line.hl.level_1, line.hl.level_2 - 0.5, False, "list")
                res.append(
                    Line(
                        line="",
                        page_id=line.page_id,
                        line_id=line.line_id,
                        hl=list_hl,
                        annotations=[],
                    )
                )
                previous_levels.append(line.hl)
        elif not line.hl.is_raw_text():
            previous_levels = []
        res.append(line)
    return res


def _merge_tree_annotations(root: TreeNode) -> None:
    stack = [root]
    while stack:
        node = stack.pop()
        node.annotations = merge_annotations(node.annotations, node.text)
        stack.extend(node.subparagraphs)


def tree_to_text(node: TreeNode) -> str:
    """json2txt semantics (api_utils.py:271-274): recursive '\\n' join; note
    the unconditional trailing newline after each node's text."""
    sub = "\n".join(tree_to_text(child) for child in node.subparagraphs)
    return f"{node.text}\n{sub}"


def flatten_tree(node: TreeNode) -> List[Dict]:
    """Queryable flat nodes view: (node_id, parent_id, depth, paragraph_type,
    text, n_annotations) — the relational complement of the JSON tree."""
    out: List[Dict] = []
    stack = [node]
    while stack:
        n = stack.pop()
        out.append(
            {
                "node_id": n.node_id,
                "parent_id": n.parent.node_id if n.parent is not None else None,
                "depth": n.node_id.count("."),
                "paragraph_type": n.hl.line_type,
                "text": n.text,
                "n_annotations": len(n.annotations),
            }
        )
        stack.extend(reversed(n.subparagraphs))
    return out
