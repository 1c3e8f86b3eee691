"""json2html debug rendering — parity with the reference's API renderer
(dedoc/api/api_utils.py:114-260): nested <p> blocks with &nbsp; indents and
node-id <sub> footers, <strong>/<em> for header/root/list_item paragraph
types, page separators, annotation span insertion (bold/italic/strike/
sub/sup/underline tags, table/attachment links appended at span end), and
bordered tables with display:none on invisible merged-cell clones.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from dedoc_spark.core.model import HierarchyLevel, Table
from dedoc_spark.core.tree import TreeNode

_BOOL_TAGS = {
    "bold": "b",
    "italic": "i",
    "strike": "strike",
    "subscript": "sub",
    "superscript": "sup",
    "underlined": "u",
}


def _annotations2html(text: str, annotations, table2id: Dict[str, int], attach2id: Dict[str, int], tabs: int = 0) -> str:
    """Span-insertion algorithm of api_utils.py:207-244: collect open/close
    tags per index, then insert back-to-front."""
    indexes: Dict[int, str] = {}
    for a in annotations:
        name, value = a.name, a.value
        if name not in _BOOL_TAGS and name not in ("table", "attachment") and not value.startswith("heading "):
            continue
        if name in _BOOL_TAGS and value == "False":
            continue
        indexes.setdefault(a.start, "")
        indexes.setdefault(a.end, "")
        if name == "table":
            indexes[a.end] += f' (<a href="#{value}">table {table2id.get(value, "?")}</a>)'
        elif name == "attachment":
            indexes[a.end] += f' (<a href="#{value}">attachment {attach2id.get(value, "?")}</a>)'
        else:
            tag = _BOOL_TAGS.get(name, "p")
            indexes[a.start] += f"<{tag}>"
            indexes[a.end] = f"</{tag}>" + indexes[a.end]
    for index, tag in sorted(indexes.items(), reverse=True):
        text = text[:index] + tag + text[index:]
    return text.replace("\n", f'<br>{"&nbsp;" * tabs}')


def table2html(table: Table, table2id: Dict[str, int]) -> str:
    """api_utils.py:246-260 shape: bordered table, merged-cell clones hidden."""
    title = f" {table.title}" if table.title else ""
    out = [f"<h4> table {table2id.get(table.uid, '?')}:{title}</h4>"]
    out.append(f'<table border="1" id={table.uid} style="border-collapse: collapse; width: 100%;">\n<tbody>\n')
    for row in table.cells:
        out.append("<tr>\n")
        for cell in row:
            td = "<td"
            if cell.invisible:
                td += ' style="display: none" '
            td += f' colspan="{cell.colspan}" rowspan="{cell.rowspan}">'
            cell_text = "\n".join(ln.line for ln in cell.lines)
            td += cell_text.replace("\n", "<br>") + "</td>\n"
            out.append(td)
        out.append("</tr>\n")
    out.append("</tbody>\n</table>")
    return "".join(out)


def json2html(tree: TreeNode, tables: Optional[List[Table]] = None) -> str:
    """Render the document tree (+ tables section) as debug HTML."""
    tables = tables or []
    table2id = {t.uid: i for i, t in enumerate(tables)}
    attach2id: Dict[str, int] = {}
    prev_page = [0]
    parts: List[str] = []

    def walk(node: TreeNode, tabs: int) -> None:
        page_id = node.page_id or 0
        if page_id != prev_page[0]:
            parts.append(f"<center><small><b>Page {prev_page[0] + 1}</b></small></center><hr>")
            prev_page[0] = page_id
        ptext = _annotations2html(node.text, node.annotations, table2id, attach2id, tabs)
        ptype = node.hl.line_type if node.hl is not None else HierarchyLevel.raw_text
        if ptype in (HierarchyLevel.header, HierarchyLevel.root):
            ptext = f"<strong>{ptext.strip()}</strong>"
        elif ptype == HierarchyLevel.list_item:
            ptext = f"<em>{ptext.strip()}</em>"
        else:
            ptext = ptext.strip()
        parts.append(
            f'<p> {"&nbsp;" * tabs} {ptext}     <sub> id = {node.node_id} ; type = {ptype} </sub></p>'
        )
        for sub in node.subparagraphs:
            walk(sub, tabs + 4)

    walk(tree, 0)
    if tables:
        parts.append("<h3> Tables: </h3>")
        for t in tables:
            parts.append(table2html(t, table2id))
            parts.append("<p>&nbsp;</p>")
    return "".join(parts)


# --- json2tree / json2collapsed_tree (api_utils.py:17-113) --------------------


def _prettify_text(text: str):
    """60-char word-wrap of api_utils.__prettify_text (api_utils.py:17-27)."""
    res = []
    for word in text.split():
        if len(word) == 0:
            continue
        res.append(word)
        if sum(map(len, res)) >= 60:
            yield " ".join(res)
            res = []
    if len(res) > 0:
        yield " ".join(res)


def _add_vertical_line(depths, space):
    for d in depths:
        space[(d - 1) * 4] = "|"
    return "".join(space)


def json2tree(root: TreeNode) -> str:
    """Flat indented debug rendering (api_utils.py:79-106): nodes sorted by
    numeric node-id path, emitted bottom-up with |-guides for open depths,
    root text as the <h3> heading. Byte-parity with the reference."""
    stack = [root]
    nodes = []
    while len(stack) > 0:
        element = stack.pop()
        nodes.append(element)
        stack.extend(element.subparagraphs)
    nodes.sort(key=lambda node: tuple(map(int, node.node_id.split("."))))
    root_node, *rest = nodes
    result = []
    space_symbol = "&nbsp"
    depths = set()
    for node in reversed(rest):
        node_result = []
        depth = len(node.node_id.split(".")) - 1
        depths.add(depth)
        depths = {d for d in depths if d <= depth}
        space = [space_symbol] * 4 * (depth - 1) + 4 * ["-"]
        space = _add_vertical_line(depths, space)
        node_result.append(
            f"<p> <tt> <em>  {space} {node.hl.line_type}&nbsp{node.node_id} </em> </tt> </p>"
        )
        for text in _prettify_text(node.text):
            space = [space_symbol] * 4 * (depth - 1) + 4 * [space_symbol]
            space = _add_vertical_line(depths, space)
            node_result.append(f"<p> <tt> {space} {text} </tt> </p>")
        result.extend(reversed(node_result))
    result.append(f"<h3>{root_node.text}</h3>")
    return "".join(reversed(result))


def _node2tree(paragraph: TreeNode, depth: int, depths=None) -> str:
    if depths is None:
        depths = set()
    space_symbol = "&nbsp"
    space = [space_symbol] * 4 * (depth - 1) + 4 * ["-"]
    space = "".join(space)
    node_result = []
    node_result.append(f"  {space} {paragraph.hl.line_type}&nbsp{paragraph.node_id} ")
    for text in _prettify_text(paragraph.text):
        space = [space_symbol] * 4 * (depth - 1) + 4 * [space_symbol]
        space = "".join(space)
        node_result.append(f"<p>  {space} {text}  </p>")
    if len(paragraph.subparagraphs) > 0:
        sub_nodes = "\n".join(
            [
                _node2tree(sub_node, depth=depth + 1, depths=depths.union({depth}))
                for sub_node in paragraph.subparagraphs
            ]
        )
        return f"""
        <details>
            <summary> <tt> {"".join(node_result)} </tt> </summary>
            {sub_nodes}
        </details>
        """
    else:
        return f"""
                <p>
                     {"".join(node_result)}
                </p>
                """


def json2collapsed_tree(paragraph: TreeNode) -> str:
    """<details>-nested collapsible rendering (api_utils.py:60-76)."""
    result = f"""
    <!DOCTYPE html>
    <html>
     <head>
      <meta charset="utf-8">
      <title>details</title>
     </head>
     <body>
     <tt>
      {_node2tree(paragraph, depth=0)}
      </tt>
     </body>
    </html>
    """
    return result
