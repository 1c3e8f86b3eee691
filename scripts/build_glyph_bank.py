#!/usr/bin/env python3
"""Render the glyph-template bank for core/glyph_ocr from the
container's DejaVu family via core/ftrender (FreeType). BUILD-TIME
ONLY — the committed artifact dedoc_spark/models/glyph_bank.json.gz is
what workers load; they never touch FreeType (same ship-once pattern
as scripts/train_labelers.py).

Usage: python scripts/build_glyph_bank.py [out_path]
"""

import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedoc_spark.core.ftrender import FACE_FILES, FtFace, ft_available  # noqa: E402
from dedoc_spark.core.glyph_ocr import BANK_PATH, GRID, grid_features  # noqa: E402
from dedoc_spark.core.scanfont import charset_for_language  # noqa: E402

# render-size ladder: 32 px matches 300-dpi scans (10 pt ≈ 40 px caps),
# 16 px the hinted thin-stroke rendering of small text, and 26/20 px
# the intermediate hinting regimes (grid-swept against the rendered-page
# accuracy harness: (32,26,20,16) beat (32,16), (32,24,16), (32,20,16),
# (32,24,20,16) and (32,24,18,14) on mean accuracy with the corpus fax
# anchors all intact)
RENDER_SIZES = (32, 26, 20, 16)


def build(out_path: str = BANK_PATH) -> int:
    charset = charset_for_language("rus+eng")
    templates = []
    for key in sorted(FACE_FILES):
        if not ft_available(key):
            print(f"skip {key}: font/freetype unavailable", file=sys.stderr)
            continue
        for px in RENDER_SIZES:
            face = FtFace(key, px)
            for ch in charset:
                if ch == " ":
                    continue
                bm, left, top, adv = face.render(ch)
                if bm.size == 0:  # blank glyph (shouldn't happen for charset)
                    continue
                h, w = bm.shape
                # gray anti-aliased coverage (measured best against the
                # binarized scan grids whose cell means recreate the
                # fractional edges; a binarized-template variant scored
                # worse at both render sizes)
                grid = grid_features(bm.astype(np.float64) / 255.0)
                templates.append(
                    {
                        "c": ch,
                        "f": f"{key}@{px}",
                        "g": [int(round(v * 255)) for v in grid],
                        "a": round(max(w, 1) / max(h, 1), 4),
                        "h": round(h / px, 4),
                        "d": round(max(0, h - top) / px, 4),
                    }
                )
    if not templates:
        print("no templates rendered (freetype/fonts missing)", file=sys.stderr)
        return 1
    payload = {
        "version": 1,
        "grid": GRID,
        "render_px": list(RENDER_SIZES),
        "templates": templates,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with gzip.open(out_path, "wt", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote {len(templates)} templates -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(build(sys.argv[1] if len(sys.argv) > 1 else BANK_PATH))
