"""Multipage table merge — the Spark-scale relational form of the
reference's MultiPageTableExtractor (multipage_table_extractor.py:18-180;
the faithful per-document port with difflib header similarity lives in
core/multipage.py and runs inside mapInPandas when full parity is needed).

Input: one row per detected table part
  (url, page_id, table_seq, n_cols, width, rows: array<array<string>>)
where table_seq is the table's index on its page (0-based).

Chain rule (the reference's merge conditions as window predicates):
  a part continues the chain iff it is the FIRST table of its page, the
  previous part (by (page_id, table_seq) order within url) is the LAST
  table of the immediately preceding page, column counts match, and the
  widths agree within ±int(3% of the previous width). A continuation
  whose first row equals the chain head's first row (the header) drops it
  — EXACT equality here; the core port keeps the reference's difflib-0.8
  per-cell similarity.

Scale shape: two window passes over (url) ordered by (page_id, table_seq)
— one shuffle on url — then one groupBy(url, chain_id). No self-joins, no
driver loops; chains of any length fall out of the cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_multipage_tables_df(tables: DataFrame) -> DataFrame:
    """→ (url, chain_id, n_parts, page_lo, page_hi, rows) with continuation
    parts' duplicated headers removed and rows concatenated in page order."""
    w = Window.partitionBy("url").orderBy("page_id", "table_seq")

    # "previous part is the LAST table of the preceding page" is implied:
    # with rows ordered by (page_id, table_seq), the row right before the
    # FIRST table of page p (table_seq == 0) with prev_page == p−1 is by
    # construction the last table of page p−1 — no per-page window (and no
    # second shuffle) needed.
    prev_page = F.lag("page_id").over(w)
    prev_cols = F.lag("n_cols").over(w)
    prev_width = F.lag("width").over(w)
    cont = (
        (F.col("page_id") == prev_page + 1)
        & (F.col("table_seq") == 0)
        & (F.col("n_cols") == prev_cols)
        & (F.abs(F.col("width") - prev_width) <= F.floor(prev_width * F.lit(0.03)))
    )
    t = tables.withColumn("is_new_chain", F.when(F.coalesce(cont, F.lit(False)), 0).otherwise(1))
    t = t.withColumn(
        "chain_id",
        F.sum("is_new_chain").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    wc = Window.partitionBy("url", "chain_id").orderBy("page_id", "table_seq")
    header = F.first(F.col("rows")[0]).over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    member_idx = F.row_number().over(wc) - 1
    t = t.withColumn(
        "rows_dedup",
        F.when(
            (member_idx > 0) & (F.col("rows")[0] == header),
            F.slice(F.col("rows"), 2, F.greatest(F.size("rows") - 1, F.lit(0))),
        ).otherwise(F.col("rows")),
    )
    merged = (
        t.groupBy("url", "chain_id")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("page_id").alias("page_lo"),
            F.max("page_id").alias("page_hi"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("page_id", "table_seq", "rows_dedup"))
                ).getField("rows_dedup")
            ).alias("rows"),
        )
    )
    return merged
