"""cProfile the q67/q68 per-document pipelines single-process (no Spark).

Usage: python scripts/profile_ocr_doc.py [q67|q68] [n_docs] [--time-only]
Mirrors the mapInPandas bodies in driver_queries.q67_scanned_ocr /
q68_real_font_ocr exactly; numbers cited in OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedoc_spark.core.document import extract_document  # noqa: E402
from dedoc_spark.core.ftrender import render_text_page  # noqa: E402
from dedoc_spark.core.scanfont import render_scan_page, render_table_page  # noqa: E402
from dedoc_spark.sources.pdf_fixture import build_scanned_pdf  # noqa: E402

CODECS = (
    "flate", "ccitt", "ccitt_g3", "lzw",
    "runlength", "jbig2", "jbig2_mmr", "jbig2_sym",
)


def q67_doc(did: int) -> None:
    source, lang = f"s{did % 5}", ("en", "ru")[did % 2]
    pages = [
        render_scan_page([f"Doc {did} scan"], scale=2),
        render_scan_page([f"{source} {lang}"], scale=2, rotate=180),
        render_table_page(
            [["id", str(did)], [source, lang]], scale=2,
            body_lines=["page three body"],
        ),
    ]
    codec = CODECS[did % 8]
    extract_document(
        f"{did}.pdf", build_scanned_pdf(pages, image_filter=codec), None,
        params={"pdf_with_text_layer": "false", "need_pdf_table_analysis": True},
    )


def q68_doc(did: int) -> None:
    def group(did: int, row: int, i: int) -> str:
        v = (did * 7919 + row * 104729 + i * 15485863) % 10000
        if v == 3333:
            v = 3334
        return str(v).zfill(4)

    lines = [" ".join(group(did, row, i) for i in range(3)) for row in range(3)]
    raster = render_text_page(lines, face="sans", px=40)
    extract_document(
        f"{did}.pdf", build_scanned_pdf([raster], image_filter="flate"), None,
        params={"pdf_with_text_layer": "false"},
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "q67"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    time_only = "--time-only" in sys.argv
    fn = q67_doc if which == "q67" else q68_doc
    fn(0)  # warm imports / banks
    t0 = time.perf_counter()
    c0 = time.process_time()
    if time_only:
        for d in range(1, n + 1):
            fn(d)
        dt = time.perf_counter() - t0
        dc = time.process_time() - c0
        print(
            f"{which}: {n} docs in {dt:.3f}s = {1000 * dt / n:.2f} ms/doc "
            f"(cpu {1000 * dc / n:.2f} ms/doc)"
        )
        return
    pr = cProfile.Profile()
    pr.enable()
    for d in range(1, n + 1):
        fn(d)
    pr.disable()
    dt = time.perf_counter() - t0
    print(f"{which}: {n} docs in {dt:.3f}s = {1000 * dt / n:.2f} ms/doc (profiled)")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)
    st.sort_stats("tottime").print_stats(35)


if __name__ == "__main__":
    main()
