"""Deterministic synthetic web_pages table (the north-rule input shape).

Schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Every row is a pure function of (index, seed): no wall clock, no global
RNG state — regenerating at any scale yields identical bytes, which makes
the correctness goldens and the two-parallelism scaling run comparable.

Template bank mirrors FIXTURES.md §2: structured documents, boilerplate
pages, list/table/style/special-symbol exercises, plain fragments, txt
rows, and a hostile heavy tail (oversized documents) driving the skew
path.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List, Optional

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

_RU_WORDS = (
    "документ пример текст статья глава пояснение определение пункт раздел "
    "содержание таблица данные система анализ результат вывод метод задача"
).split()
_EN_WORDS = (
    "document example text article chapter note definition item section "
    "content table data system analysis result conclusion method task web page"
).split()


def _words(rng: random.Random, lang: str, n: int) -> str:
    bank = _RU_WORDS if lang == "ru" else _EN_WORDS
    return " ".join(rng.choice(bank) for _ in range(n))


def _structured_doc(rng: random.Random, lang: str, scale: int) -> str:
    parts = ["<!DOCTYPE html><html><head><meta charset=\"utf-8\">",
             "<title>t</title><script>var s=1;</script><style>.x{color:red}</style></head><body>"]
    parts.append(f"<h1>{_words(rng, lang, 3)}</h1>")
    for ch in range(1, 2 + scale):
        parts.append(f"<h2>Глава {ch}</h2>" if lang == "ru" else f"<h2>Chapter {ch}</h2>")
        parts.append(f"<p>{_words(rng, lang, 12)}</p>")
        for art in range(1, 3):
            parts.append(f"<h3>Статья {art}</h3>" if lang == "ru" else f"<h3>Section {art}</h3>")
            parts.append(
                f"<p> <b>{_words(rng, lang, 2)}</b> {_words(rng, lang, 6)} "
                f"<i>{_words(rng, lang, 2)}</i> <u>{_words(rng, lang, 1)}</u>.</p>"
            )
            parts.append(f"<p>{ch}.{art}.1. <b>{_words(rng, lang, 2)}</b> {_words(rng, lang, 4)}</p>")
            parts.append(f"<p>{ch}.{art}.2. {_words(rng, lang, 5)}</p>")
    parts.append("</body></html>")
    return "".join(parts)


def _boilerplate_page(rng: random.Random, lang: str, scale: int) -> str:
    nav = " | ".join(_words(rng, lang, 1) for _ in range(6))
    article = "".join(f"<p>{_words(rng, lang, 20)}</p>" for _ in range(3 + 2 * scale))
    return (
        "<!DOCTYPE html><html><head><script>trackPage();</script>"
        "<style>nav{display:flex}</style></head><body>"
        f"<nav>{nav}</nav><header><h1>{_words(rng, lang, 4)}</h1></header>"
        f"<article>{article}</article>"
        f"<aside>{_words(rng, lang, 8)}</aside>"
        f"<footer>© 2025 {_words(rng, lang, 2)}</footer>"
        "<!-- analytics --><script>moreJs()</script></body></html>"
    )


def _lists_page(rng: random.Random, lang: str, scale: int) -> str:
    ol1 = "".join(f"<li>{_words(rng, lang, 3)}</li>" for _ in range(4 + scale))
    ola = "".join(f"<li>{_words(rng, lang, 2)}</li>" for _ in range(28))  # carry at 26
    nested = "".join(
        f"<li>{_words(rng, lang, 2)}<ul><li>{_words(rng, lang, 2)}</li></ul></li>"
        for _ in range(2)
    )
    return (
        f"<body><h2>{_words(rng, lang, 2)}</h2>"
        f"<ol>{ol1}</ol><ol type=\"a\">{ola}</ol><ul>{nested}</ul></body>"
    )


def _tables_page(rng: random.Random, lang: str, scale: int) -> str:
    rows = "".join(
        f"<tr><td>{_words(rng, lang, 1)}</td><td>{_words(rng, lang, 2)}</td><td>{rng.randint(0, 999)}</td></tr>"
        for _ in range(3 + scale)
    )
    merged = (
        "<tr><td rowspan=\"2\">A</td><td>B</td><td>C</td></tr>"
        "<tr><td colspan=\"2\">D</td></tr>"
    )
    layout = "".join(
        f"<tr><td>{_words(rng, lang, 2)}</td><td>{_words(rng, lang, 3)}</td></tr>" for _ in range(2)
    )
    return (
        f"<body><p>{_words(rng, lang, 6)}</p>"
        f"<table border=\"1\">{merged}{rows}</table>"
        f"<table>{layout}</table>"  # border-less → flattened to lines
        f"<p>{_words(rng, lang, 4)}</p></body>"
    )


def _styles_page(rng: random.Random, lang: str, scale: int) -> str:
    return (
        "<body>"
        f"<p style=\"font-size:14pt;font-weight:bold\">{_words(rng, lang, 4)}</p>"
        f"<p style=\"font-size:16px;text-align:center\">{_words(rng, lang, 5)}</p>"
        f"<p style=\"font-family:Arial\">{_words(rng, lang, 6)}</p>"
        f"<p style=\"display:none\">{_words(rng, lang, 2)}</p>"
        f"<p>see <a href=\"https://ref.example/{rng.randint(0, 99)}\">{_words(rng, lang, 2)}</a></p>"
        "</body>"
    )


def _special_page(rng: random.Random, lang: str, scale: int) -> str:
    return (
        f"<body><p>{_words(rng, lang, 3)}<br>{_words(rng, lang, 3)}</p>"
        f"<p>{_words(rng, lang, 2)}&nbsp;{_words(rng, lang, 2)}</p>"
        f"<span>{_words(rng, lang, 3)}</span><p>{_words(rng, lang, 4)}</p></body>"
    )


def _plain_fragment(rng: random.Random, lang: str, scale: int) -> str:
    return f"<p>{_words(rng, lang, 10)}</p><div>{_words(rng, lang, 8)}</div>"


def _hostile_page(rng: random.Random, lang: str, scale: int) -> str:
    # deep nesting + unclosed tags + a fat body: the skew tail
    depth = 30
    body = "".join(f"<p>{_words(rng, lang, 25)}</p>" for _ in range(20 * (1 + scale)))
    return (
        "<body>" + "<div>" * depth + f"<p>unclosed <b>bold {_words(rng, lang, 4)}"
        + body + "</div>" * (depth // 2)
    )


_HTML_TEMPLATES = [
    _structured_doc,
    _boilerplate_page,
    _lists_page,
    _tables_page,
    _styles_page,
    _special_page,
    _plain_fragment,
]


def _txt_payload(rng: random.Random, lang: str, scale: int) -> str:
    lines: List[str] = [f"{_words(rng, lang, 4)}\n", "\n"]
    for i in range(1, 4 + scale):
        lines.append(f"{i}. {_words(rng, lang, 6)}\n")
        lines.append(f"  а) {_words(rng, lang, 4)}\n" if lang == "ru" else f"  a) {_words(rng, lang, 4)}\n")
    lines.append("\n")
    lines.append(f"\t{_words(rng, lang, 8)}\n")
    return "".join(lines)


def make_row(i: int, seed: int = 42) -> Dict:
    """One deterministic web_pages row."""
    rng = random.Random((seed << 32) ^ i)
    lang = "ru" if i % 2 == 0 else "en"
    url = f"https://site{i % 1000}.example/page/{i}"
    warc_ts = EPOCH + timedelta(seconds=i)
    kind = i % 10
    if kind == 9:  # 10% plain-text rows
        return {"url": url, "warc_ts": warc_ts, "html": b"", "text": _txt_payload(rng, lang, i % 3), "lang": lang}
    if i % 997 == 0:  # heavy tail: oversized hostile docs (skew driver)
        html = _hostile_page(rng, lang, 10)
    elif kind == 8:
        html = _hostile_page(rng, lang, 0)
    else:
        html = _HTML_TEMPLATES[kind % len(_HTML_TEMPLATES)](rng, lang, i % 3)
    return {"url": url, "warc_ts": warc_ts, "html": html.encode("utf-8"), "text": "", "lang": lang}


def generate_rows(n: int, seed: int = 42, start: int = 0) -> Iterator[Dict]:
    for i in range(start, start + n):
        yield make_row(i, seed)


def write_parquet(
    path: str, n: int, seed: int = 42, rows_per_file: Optional[int] = None
) -> str:
    """Write the synthetic table as a DIRECTORY of parquet part files.

    Many small files (not one big one) so a cold scan parallelizes: a
    single-file input makes the scan + shuffle-write a serial section that
    caps scaling (Amdahl) — exactly the pathology the north rule's
    two-cluster-size criterion is meant to catch.  The default file size
    adapts to n (≥128 files once n allows it): a 20k-page corpus in
    1000-row files is only 20 tasks — a 32-slot box would idle a third of
    its cores on the scan-aligned extraction (measured on the bench
    headline).  Row CONTENT is a deterministic function of (n, seed)
    only; the chunking never changes the table."""
    if rows_per_file is None:
        rows_per_file = min(1_000, max(64, n // 128))
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    os.makedirs(path, exist_ok=True)
    part = 0
    buf: List[Dict] = []
    for row in generate_rows(n, seed):
        buf.append(row)
        if len(buf) >= rows_per_file:
            pq.write_table(pa.Table.from_pylist(buf, schema=schema), f"{path}/part-{part:05d}.parquet")
            part += 1
            buf = []
    if buf or part == 0:
        pq.write_table(pa.Table.from_pylist(buf, schema=schema), f"{path}/part-{part:05d}.parquet")
    return path


def ensure_web_pages(n: int, seed: int = 42, cache_dir: str = "/tmp/dedoc_spark_webpages") -> str:
    """Generate-once cache for tests/bench: directory keyed by (n, seed)."""
    import os
    import shutil

    os.makedirs(cache_dir, exist_ok=True)
    # v2: adaptive rows_per_file layout (content identical, more files)
    path = os.path.join(cache_dir, f"web_pages_n{n}_s{seed}_v2")
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_parquet(tmp, n, seed)
        os.replace(tmp, path)
    return path
