"""Differential OCR sweep: digest q67/q68-style documents end-to-end.

Usage: python scripts/ocr_sweep.py out.json [n_docs]
Run before and after a matcher/codec change and diff the JSON — every
value is an md5 of the full extract_document output, so any behavior
change in decode, orientation, segmentation or matching shows up.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_ocr_doc import CODECS  # noqa: E402


def digest(d) -> str:
    return hashlib.md5(
        json.dumps(d, sort_keys=True, ensure_ascii=False).encode()
    ).hexdigest()


def main() -> None:
    out_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from dedoc_spark.core.document import extract_document
    from dedoc_spark.core.ftrender import render_text_page
    from dedoc_spark.core.scanfont import render_scan_page, render_table_page
    from dedoc_spark.sources.pdf_fixture import build_scanned_pdf

    out = {}
    for did in range(n):
        source, lang = f"s{did % 5}", ("en", "ru")[did % 2]
        pages = [
            render_scan_page([f"Doc {did} scan"], scale=2),
            render_scan_page([f"{source} {lang}"], scale=2, rotate=180),
            render_table_page(
                [["id", str(did)], [source, lang]], scale=2,
                body_lines=["page three body"],
            ),
        ]
        d = extract_document(
            f"{did}.pdf", build_scanned_pdf(pages, image_filter=CODECS[did % 8]),
            None,
            params={"pdf_with_text_layer": "false", "need_pdf_table_analysis": True},
        )
        out[f"q67:{did}"] = digest(d)
    for did in range(n):
        def group(did: int, row: int, i: int) -> str:
            v = (did * 7919 + row * 104729 + i * 15485863) % 10000
            return str(v if v != 3333 else 3334).zfill(4)

        lines = [" ".join(group(did, row, i) for i in range(3)) for row in range(3)]
        raster = render_text_page(lines, face="sans", px=40)
        d = extract_document(
            f"{did}.pdf", build_scanned_pdf([raster], image_filter="flate"), None,
            params={"pdf_with_text_layer": "false"},
        )
        out[f"q68:{did}"] = digest(d)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote {len(out)} digests to {out_path}")


if __name__ == "__main__":
    main()
