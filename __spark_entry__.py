"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full HTML extraction pipeline (dedoc
semantics: block walk → annotations → structure patterns → tree →
json2txt) over HTML synthesized deterministically from the sf0.001
documents table, via the Arrow-batched mapInPandas stage.

queries()/oracle_sql() — operators from SURVEY.md §2 mapped onto the
driver tables, each with an expression-mirrored DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dedoc_spark.plans.driver_queries import q17_html_extract

    return q17_html_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedoc_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedoc_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
