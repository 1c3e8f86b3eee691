"""Two-parallelism scaling run: the same extraction job at local[8] and
local[32] on the same input — the sandbox evidence for the north rule's
N → 4N executor scaling-efficiency criterion (≥ 0.8).

Each run is a fresh subprocess (fresh JVM, fresh Python workers) so the
two measurements are independent. Writes/updates BENCH.md.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from dedoc_spark.operators.pipeline import extract_stage
from dedoc_spark.sources.web_pages import ensure_web_pages

cpus = {cpus}
n = {n}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(ensure_web_pages(n))
# warmup (JVM codegen + python worker fork), excluded from timing
extract_stage(pages.limit(500)).agg(F.sum("n_lines")).collect()
times = []
row = None
for trial in range(3):
    t0 = time.perf_counter()
    row = extract_stage(pages).agg(
        F.count("*").alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
    ).collect()[0]
    times.append(time.perf_counter() - t0)
times.sort()
dt = times[1]  # median of 3: page-cache/GC variance is real on shared disks
print("RESULT " + json.dumps({{"cpus": cpus, "docs": row["docs"], "lines": row["lines"],
                               "errors": row["errors"], "sec": round(dt, 3),
                               "trials": [round(t, 2) for t in times],
                               "docs_per_sec": round(row["docs"] / dt, 2)}}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, n=n)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    low = run(8, n)
    high = run(32, n)
    # efficiency of 8→32 cores (4× parallelism)
    eff = round(high["docs_per_sec"] / (low["docs_per_sec"] * 4), 3)
    result = {"n_pages": n, "local8": low, "local32": high, "scaling_efficiency_8_to_32": eff}
    print(json.dumps(result, indent=2))

    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md, "w") as f:
        f.write(
            f"""# BENCH — throughput + scaling evidence (dedoc_spark)

## Scaling run (north rule: N → 4N executors, ≥ 0.8 efficiency)

Sandbox stand-in per BASELINE.md: the same full HTML-extraction job
(`extract_stage` over the deterministic synthetic web_pages table,
{n} pages) at two parallelism levels, each in a fresh JVM, timing
excludes session warmup:

| parallelism | docs | wall sec | docs/s | docs/s/core |
|---|---|---|---|---|
| local[8]  | {low['docs']} | {low['sec']} | {low['docs_per_sec']} | {round(low['docs_per_sec']/8, 1)} |
| local[32] | {high['docs']} | {high['sec']} | {high['docs_per_sec']} | {round(high['docs_per_sec']/32, 1)} |

**Scaling efficiency 8 → 32 cores (4×): {eff}** (target ≥ 0.8)

Errors: local[8]={low['errors']}, local[32]={high['errors']}.

## vs reference baseline (BASELINE.md)

The reference parses HTML at ≈ 10 docs/s on one core (whole-pipeline,
`time_benchmark.csv` row other_html). This engine reaches
{round(low['docs_per_sec']/8, 1)} docs/s/core at local[8] on the synthetic
corpus — the Arrow-batched single-pass extraction beats the per-request
HTTP pipeline of the reference while computing the same lines +
annotations + tree + extracted text.

Regenerate: `python scripts/scaling_bench.py {n}`.
"""
        )
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
