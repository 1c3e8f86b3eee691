"""Extra benchmarks for optimization work (guide §1.4): noop-sink
isolation per query so the computation is timed, not the sink, with
labeled jobs. NOT the driver's bench — bench.py stays frozen; numbers
from here are cited in OPTIMIZATION_r07.md.

Usage: python bench_extra.py [query ...]   (default: a curated hot set)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_TRIALS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

DEFAULT = [
    "html_extract", "q17_html_extract", "q18_txt_extract", "q07_minhash",
    "q35_gopher_repetition", "q43_dup_spans", "q44_winnow_fingerprints",
    "q26_lsh_cosine", "q29_dup_groups", "q65_gost_frame",
    "q57_pdf_ruled_tables", "q67_scanned_ocr", "q68_real_font_ocr",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from dedoc_spark.plans import driver_queries as dq

    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("dedoc_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    timings = {}
    for nm in names:
        if nm == "html_extract":
            from pyspark.sql import functions as F

            from dedoc_spark.operators.pipeline import extract_stage
            from dedoc_spark.sources.web_pages import ensure_web_pages

            pages = spark.read.parquet(ensure_web_pages(20_000))
            extract_stage(pages.limit(200)).agg(F.sum("n_lines")).collect()  # warm
            build = lambda: extract_stage(pages)  # noqa: E731
        else:
            fn = getattr(dq, nm)
            build = lambda fn=fn: fn(spark, SF_DIR)  # noqa: E731
        best = None
        for t in range(TRIALS):
            sc.setJobDescription(f"{nm} trial {t}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        sc.setJobDescription(None)
        timings[nm] = round(best, 3)
        print(f"  {nm}: {timings[nm]}", file=sys.stderr)
    print(json.dumps({"sf": os.path.basename(SF_DIR.rstrip('/')), "cpus": CPUS,
                      "trials": TRIALS, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
