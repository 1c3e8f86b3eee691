"""Hand-built PDF generation for tests (FIXTURES.md §5): uncompressed
content streams, Helvetica/Helvetica-Bold, known line positions — no
external writer."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

PageLines = Sequence[Tuple[str, bool]]  # (text, bold)


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: Sequence[PageLines]) -> bytes:
    """Each page: lines drawn top-down starting at y=760, 20pt leading."""
    objects: List[bytes] = []

    def add(obj: str) -> int:
        objects.append(obj.encode("latin-1"))
        return len(objects)

    font_regular = add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    font_bold = add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")

    page_obj_ids: List[int] = []
    content_ids: List[int] = []
    for lines in pages:
        ops = ["BT", "/F1 12 Tf", "1 0 0 1 72 760 Tm", "20 TL"]
        for i, (text, bold) in enumerate(lines):
            ops.append("/F2 12 Tf" if bold else "/F1 12 Tf")
            if i > 0:
                ops.append("T*")
            ops.append(f"({_escape(text)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops)
        content_ids.append(
            add(f"<< /Length {len(stream)} >>\nstream\n{stream}\nendstream")
        )

    pages_id_placeholder = len(objects) + len(pages) + 1
    for content_id in content_ids:
        page_obj_ids.append(
            add(
                f"<< /Type /Page /Parent {pages_id_placeholder} 0 R "
                f"/MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_regular} 0 R /F2 {font_bold} 0 R >> >> "
                f"/Contents {content_id} 0 R >>"
            )
        )
    kids = " ".join(f"{pid} 0 R" for pid in page_obj_ids)
    pages_id = add(f"<< /Type /Pages /Kids [{kids}] /Count {len(page_obj_ids)} >>")
    assert pages_id == pages_id_placeholder
    catalog_id = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>")

    out: List[bytes] = [b"%PDF-1.4\n"]
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(sum(len(b) for b in out))
        out.append(f"{i} 0 obj\n".encode() + obj + b"\nendobj\n")
    xref_pos = sum(len(b) for b in out)
    xref = [f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n"]
    for off in offsets[1:]:
        xref.append(f"{off:010d} 00000 n \n")
    out.append("".join(xref).encode())
    out.append(
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_id} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return b"".join(out)


def example_pdf(n_pages: int = 3, with_header_footer: bool = True) -> bytes:
    """Multi-page fixture with repeated header/footer (digit-varying page
    numbers) around per-page body lines — drives the voting path."""
    # body lines must differ by WORDS, not digits: digit masking ('\d+'→'@')
    # folds digit-only differences into one pattern by design
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split()
    pages: List[List[Tuple[str, bool]]] = []
    for p in range(n_pages):
        lines: List[Tuple[str, bool]] = []
        if with_header_footer:
            lines.append(("ACME Corp confidential report", False))
        lines.append((f"Section {p + 1}", True))
        for i in range(6):
            w1 = words[(p * 6 + i) % len(words)]
            w2 = words[(p * 3 + i * 5 + 7) % len(words)]
            lines.append((f"body {w1} paragraph about {w2} here", False))
        if with_header_footer:
            lines.append((f"- {p + 1} -", False))
        pages.append(lines)
    return build_pdf(pages)
