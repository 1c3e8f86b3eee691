"""Interleaved Spark-vs-control scaling evidence (VERDICT r5 #1).

The north rule's N → 4N criterion is evidenced on this single box by a
parallelism ladder, but separate Spark and control runs can land in
different noise windows on the shared host.  This script removes that
objection: in ONE exclusive window it alternates taskset-pinned Spark
and a no-Spark multiprocessing control — A/B/A/B, ``pairs`` trials each
— at 8 and 32 cores, over the SAME 200k-page parquet corpus, and
reports raw docs/s plus the Spark/control ratio per width.

The control is the strongest possible one: the IDENTICAL per-document
function (core.document.extract_document) over the IDENTICAL parquet
part files, driven by a plain multiprocessing.Pool — it measures what
the box's cores + memory subsystem can do on this workload with zero
framework overhead.  If control efficiency 8 → 32 also falls below 0.8,
the fall-off is the socket's memory bandwidth, not Spark plan structure;
the Spark/control ratio per width is then the framework-efficiency
evidence (target ≥ 0.95).

Method per trial (both systems): fresh process tree pinned with
``taskset -c 0-(w-1)``, one FULL untimed warmup pass (python-worker
fork + codegen + page cache), then one timed full pass.  Reported =
min over trials (deterministic work; min rejects noise bursts, which
reach 2-3x on this host).

Usage: python scripts/scaling_ab.py [pairs] [n_pages]   (defaults 5, 200000)
Run EXCLUSIVELY — no concurrent Spark/CPU work.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from dedoc_spark.operators.pipeline import extract_stage
from dedoc_spark.sources.web_pages import ensure_web_pages

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         # pack the corpus's 200 small part files into ~3 tasks per slot
         # instead of 200 one-file tasks: at 32-wide the per-task python
         # setup + 6 ragged waves cost 11.9 vs 8.2 s on this exact job,
         # while over-packing 8-wide to ONE wave removes load balancing
         # (39 vs 22 s under noise) — the open-cost is sized per width
         # for ~3x slots partitions.  The control's static
         # 1-batch-per-worker split is the same tradeoff, maximally
         # coarse.
         .config(
             "spark.sql.files.openCostInBytes",
             str(int(128 * 1024 * 1024 * 3 * {cpus} / 200)),
         )
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(ensure_web_pages({n})).select("url", "html", "text")

def run_once():
    return extract_stage(pages).agg(
        F.count("*").alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
    ).collect()[0]

row = run_once()  # full warmup pass, untimed
times = []
for _ in range({passes}):
    t0 = time.perf_counter()
    row = run_once()
    times.append(round(time.perf_counter() - t0, 2))
sec = min(times)
print("RESULT " + json.dumps({{"system": "spark", "cpus": cpus, "docs": row["docs"],
                               "errors": row["errors"], "sec": sec, "times": times,
                               "docs_per_sec": round(row["docs"] / sec, 1)}}))
spark.stop()
"""

CONTROL_SNIPPET = r"""
import glob, json, sys, time
sys.path.insert(0, {repo!r})
from multiprocessing import Pool
from dedoc_spark.sources.web_pages import ensure_web_pages

cpus = {cpus}
files = sorted(glob.glob(ensure_web_pages({n}) + "/*.parquet"))

def work(file_batch):
    import pyarrow.parquet as pq
    from dedoc_spark.core.document import extract_document
    docs = errors = 0
    for f in file_batch:
        t = pq.read_table(f, columns=["url", "html", "text"])
        for url, html, text in zip(
            t.column("url").to_pylist(),
            t.column("html").to_pylist(),
            t.column("text").to_pylist(),
        ):
            d = extract_document(url, html, text)
            docs += 1
            errors += d["error"] is not None
    return docs, errors

batches = [files[i::cpus] for i in range(cpus)]

def run_once(pool):
    res = pool.map(work, batches)
    return sum(r[0] for r in res), sum(r[1] for r in res)

with Pool(cpus) as pool:
    run_once(pool)  # full warmup pass, untimed (fork + page cache)
    times = []
    for _ in range({passes}):
        t0 = time.perf_counter()
        docs, errors = run_once(pool)
        times.append(round(time.perf_counter() - t0, 2))
sec = min(times)
print("RESULT " + json.dumps({{"system": "control", "cpus": cpus, "docs": docs,
                               "errors": errors, "sec": sec, "times": times,
                               "docs_per_sec": round(docs / sec, 1)}}))
"""


def run_trial(snippet: str, cpus: int, n: int, passes: int = 3) -> dict:
    code = snippet.format(repo=REPO, cpus=cpus, n=n, passes=passes)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            print(
                f"  {r['system']:>7}@{cpus}: {r['sec']}s (passes {r['times']}) "
                f"= {r['docs_per_sec']} docs/s",
                flush=True,
            )
            return r
    raise RuntimeError(f"trial failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    results: dict = {}
    for cpus in (8, 32):
        spark_trials, control_trials = [], []
        for i in range(pairs):
            print(f"width {cpus}, pair {i + 1}/{pairs} (A/B interleaved):", flush=True)
            spark_trials.append(run_trial(SPARK_SNIPPET, cpus, n))
            control_trials.append(run_trial(CONTROL_SNIPPET, cpus, n))
        results[cpus] = {
            "spark": max(t["docs_per_sec"] for t in spark_trials),
            "control": max(t["docs_per_sec"] for t in control_trials),
            "spark_trials": [x for t in spark_trials for x in t["times"]],
            "control_trials": [x for t in control_trials for x in t["times"]],
        }
        results[cpus]["ratio"] = round(results[cpus]["spark"] / results[cpus]["control"], 3)

    summary = {
        "n_pages": n,
        "pairs": pairs,
        "widths": results,
        "spark_eff_8_32": round(results[32]["spark"] / (results[8]["spark"] * 4), 3),
        "control_eff_8_32": round(results[32]["control"] / (results[8]["control"] * 4), 3),
    }
    print(json.dumps(summary, indent=2))

    section = f"""## Interleaved Spark-vs-control A/B at 8 and 32 cores (r6)

One exclusive window, alternating taskset-pinned trials — Spark then the
no-Spark multiprocessing control, {pairs} pairs per width — on the SAME
{n:,}-page corpus.  The control runs the IDENTICAL per-document function
(core.document.extract_document) over the identical parquet part files
via multiprocessing.Pool: zero framework overhead, so it measures the
box's ceiling for this workload, and interleaving puts both systems in
the same noise window.  Per-invocation = fresh pinned
process tree, full untimed warmup pass, then 3 timed passes (a fresh
JVM needs several full passes before C2 compilation stabilizes — the
control's python workers are warm after one); best over all passes of
all invocations reported.

| width | Spark docs/s | control docs/s | Spark/control | Spark passes (s) | control passes (s) |
|---|---|---|---|---|---|
| 8 | {results[8]['spark']} | {results[8]['control']} | {results[8]['ratio']} | {results[8]['spark_trials']} | {results[8]['control_trials']} |
| 32 | {results[32]['spark']} | {results[32]['control']} | {results[32]['ratio']} | {results[32]['spark_trials']} | {results[32]['control_trials']} |

8 → 32 efficiency: Spark {summary['spark_eff_8_32']}, control
{summary['control_eff_8_32']}.  The control IS the bandwidth ceiling —
whatever it loses from 8 → 32 wide is the socket's memory subsystem, not
plan structure (the extraction plan has zero shuffles); the Spark/control
ratio per width is the framework-efficiency evidence.

Regenerate: `python scripts/scaling_ab.py {pairs} {n}` (run exclusively).
"""
    bench_path = os.path.join(REPO, "BENCH.md")
    text = open(bench_path).read()
    pattern = re.compile(
        r"## Interleaved Spark-vs-control A/B.*?(?=^#|\Z)", re.S | re.M
    )
    if pattern.search(text):
        text = pattern.sub(section + "\n", text)
    else:
        # insert right after the Scaling section's block
        blocks = re.split(r"(?m)^(?=#)", text)
        out = []
        inserted = False
        for b in blocks:
            out.append(b)
            if b.startswith("## Scaling") and not inserted:
                out.append(section + "\n")
                inserted = True
        if not inserted:
            out.append(section + "\n")
        text = "".join(out)
    with open(bench_path, "w") as f:
        f.write(text)
    print("wrote BENCH.md section")


if __name__ == "__main__":
    main()
