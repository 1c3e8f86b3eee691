"""Scale rehearsal for the DESTRUCTIVE dedup family (VERDICT r4 #5).

q61/q06-style gates exercise remove_duplicated_spans and dedup_corpus at
500 rows; this script runs them one order of magnitude past the driver
tables — 200k documents x ~600 tokens (~120M tokens, ~0.8 GB raw text,
multi-GB shuffled) — in an exclusive window and prints wall time,
shuffle read/write bytes (Spark UI REST), executor peak memory, and the
join inventory of each plan (the ExactSubstr path must stay
anti-join-shaped: no self-join, no cartesian product anywhere).

Corpus construction (deterministic, generated IN Spark — the driver
never holds the corpus):
  - every doc: 600 words drawn from a 50k vocabulary by hash(doc_id, i)
  - every 5th doc is prefixed with the SAME 120-token passage
    (40k duplicated occurrences of every 5-token span in it —
    remove_duplicated_spans must keep exactly one canonical copy)
  - every 50th doc regenerates its predecessor's 600-token BODY (the
    predecessor, being a multiple of 5, also carries the shared passage
    the copy lacks) — ~4k pairs at jaccard ≈ 598/722 ≈ 0.83, just above
    the 0.8 threshold: a deliberately tight near-dup for the
    minhash->LSH->jaccard->CC chain, not an exact duplicate

Usage: python scripts/dedup_scale_rehearsal.py [n_docs] [out_json] [stages]
  stages: "all" (default) or "spans" (remove_duplicated_spans only — the
  slope-measurement mode for the 1M+ runs, VERDICT r5 #5)
Run EXCLUSIVELY (no concurrent Spark/CPU work) per CLAUDE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = sys.argv[2] if len(sys.argv) > 2 else ""
STAGES = sys.argv[3] if len(sys.argv) > 3 else "all"
WORK = "/tmp/dedoc_spark_rehearsal"


def ui_totals(port: int = 4040) -> dict:
    """Cumulative shuffle/memory metrics from the local Spark UI."""
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    execs = json.load(urllib.request.urlopen(f"{base}/{app_id}/executors", timeout=10))
    peak = 0
    for e in execs:
        m = e.get("peakMemoryMetrics") or {}
        peak = max(peak, m.get("JVMHeapMemory", 0) + m.get("JVMOffHeapMemory", 0))
    return {
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "peak_jvm_bytes": peak,
    }


def join_inventory(df) -> dict:
    """Join/exchange census of the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "hash_joins": plan.count("HashJoin"),
        "cartesian": plan.count("Cartesian"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoop"),
        "exchanges": plan.count("Exchange"),
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dedoc_spark.operators.dedup import dedup_corpus, remove_duplicated_spans
    from dedoc_spark.operators._persist import release

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dedup_scale_rehearsal")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", WORK + "/spill")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{WORK}/corpus_{N_DOCS}.parquet"
    if not os.path.exists(corpus_path):
        # 120-token shared passage (fixed), 600-token unique body per doc
        passage = " ".join(f"shared{i % 997}" for i in range(120))
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(600)),
                lambda i: F.concat(
                    F.lit("w"), (F.xxhash64(F.col("doc_id"), i) % 50_000).cast("string")
                ),
            ),
        )
        docs = (
            spark.range(0, N_DOCS, 1, 64)
            .select(F.col("id").alias("doc_id"))
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 50 == 1,
                    # predecessor's BODY only (hash keyed on id-1) — the
                    # predecessor also has the passage prefix, so the pair
                    # lands at jaccard ≈ 0.83 (docstring)
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(1), F.lit(600)),
                            lambda i: F.concat(
                                F.lit("w"),
                                (F.xxhash64(F.col("doc_id") - 1, i) % 50_000).cast("string"),
                            ),
                        ),
                    ),
                )
                .when(F.col("doc_id") % 5 == 0, F.concat(F.lit(passage + " "), body))
                .otherwise(body)
                .alias("text"),
            )
        )
        docs.write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    report = {"n_docs": N_DOCS, "corpus_bytes": sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path)
        if f.endswith(".parquet")
    )}

    # --- ExactSubstr removal -------------------------------------------------
    before = ui_totals()
    out = remove_duplicated_spans(docs, window=5)
    report["span_removal_plan"] = join_inventory(out)
    t0 = time.perf_counter()
    row = out.agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text_dedup")).alias("chars_after"),
        F.sum("n_removed").alias("tokens_removed"),
    ).collect()[0]
    report["span_removal_wall_s"] = round(time.perf_counter() - t0, 1)
    after = ui_totals()
    report["span_removal_shuffle_read_gb"] = round(
        (after["shuffle_read_bytes"] - before["shuffle_read_bytes"]) / 2**30, 2
    )
    report["span_removal_shuffle_write_gb"] = round(
        (after["shuffle_write_bytes"] - before["shuffle_write_bytes"]) / 2**30, 2
    )
    chars_before = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    report["span_removal_docs"] = int(row["docs"])
    report["chars_before"] = int(chars_before)
    report["chars_after"] = int(row["chars_after"])
    report["tokens_removed"] = int(row["tokens_removed"])

    # --- near-dup chain ------------------------------------------------------
    if STAGES == "spans":
        report["peak_jvm_gb"] = round(after["peak_jvm_bytes"] / 2**30, 2)
        release()
        print(json.dumps(report, indent=2))
        if OUT:
            with open(OUT, "w") as f:
                json.dump(report, f, indent=2)
        spark.stop()
        return

    before = ui_totals()
    # dedup_corpus computes eagerly inside (CC rounds checkpoint); the
    # timer must wrap the call, not just the final agg
    t0 = time.perf_counter()
    deduped = dedup_corpus(docs, threshold=0.8)
    row = deduped.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("is_representative").cast("long")).alias("reps"),
    ).collect()[0]
    report["dedup_corpus_wall_s"] = round(time.perf_counter() - t0, 1)
    after = ui_totals()
    report["dedup_corpus_shuffle_read_gb"] = round(
        (after["shuffle_read_bytes"] - before["shuffle_read_bytes"]) / 2**30, 2
    )
    report["dedup_corpus_shuffle_write_gb"] = round(
        (after["shuffle_write_bytes"] - before["shuffle_write_bytes"]) / 2**30, 2
    )
    report["dedup_docs"] = int(row["docs"])
    report["dedup_representatives"] = int(row["reps"])
    report["peak_jvm_gb"] = round(after["peak_jvm_bytes"] / 2**30, 2)
    release()

    print(json.dumps(report, indent=2))
    if OUT:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
