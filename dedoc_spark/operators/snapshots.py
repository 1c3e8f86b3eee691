"""Snapshot commit log: atomic manifest commits + crash-safe resume.

The north-star deployment writes to Iceberg and resumes from its snapshot
log; this module implements the same protocol shape on any filesystem so
the pipeline is checkpoint-resumable without an Iceberg runtime:

  output_dir/batch=<id>/part-*.parquet     data files (written first)
  log_dir/<id>.manifest.json               the COMMIT (atomic rename)

A batch exists only once its manifest does — data directories without a
manifest are uncommitted garbage from a crashed attempt and are ignored by
readers and re-done by resume, exactly like Iceberg's snapshot semantics
(a writer crash can never corrupt the committed view). Manifests carry the
per-partition lineage/metrics rows (north rule) so the commit log doubles
as the job's metrics ledger.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(log_dir: str, batch_id: str) -> str:
    return os.path.join(log_dir, f"{batch_id}.manifest.json")


def commit_batch(
    extracted: DataFrame,
    output_dir: str,
    log_dir: str,
    batch_id: str,
    extra: Optional[Dict] = None,
) -> Dict:
    """Write one batch's output and COMMIT it: data parquet first, then the
    manifest via write-tmp + atomic rename. Returns the manifest dict.

    Re-committing an existing batch_id is a no-op (idempotent replay)."""
    from dedoc_spark.operators.pipeline import lineage_metrics

    os.makedirs(log_dir, exist_ok=True)
    manifest_file = _manifest_path(log_dir, batch_id)
    if os.path.exists(manifest_file):
        with open(manifest_file) as f:
            return json.load(f)

    data_path = os.path.join(output_dir, f"batch={batch_id}")
    extracted.write.mode("overwrite").parquet(data_path)
    metrics = [r.asDict() for r in lineage_metrics(
        extracted.sparkSession.read.parquet(data_path)
    ).collect()]
    manifest = {
        "batch_id": batch_id,
        "data_path": data_path,
        "row_count": int(sum(m["url_count"] for m in metrics)),
        "error_count": int(sum(m["errors"] for m in metrics)),
        "partition_metrics": metrics,
        "committed_at": int(time.time()),
        **(extra or {}),
    }
    tmp = manifest_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, ensure_ascii=False)
    os.replace(tmp, manifest_file)  # the atomic commit point
    return manifest


def committed_manifests(log_dir: str) -> List[Dict]:
    if not os.path.isdir(log_dir):
        return []
    out = []
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".manifest.json"):
            with open(os.path.join(log_dir, name)) as f:
                out.append(json.load(f))
    return out


def read_committed(spark: SparkSession, log_dir: str) -> Optional[DataFrame]:
    """The committed view: union of manifested data paths only — parquet
    left behind by a crashed, un-manifested attempt is invisible."""
    paths = [m["data_path"] for m in committed_manifests(log_dir)]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def resume_uncommitted(src: DataFrame, spark: SparkSession, log_dir: str) -> DataFrame:
    """Rows of src whose url is not in any committed batch (anti-join on
    the committed view — broadcast-able while the done set is small)."""
    done = read_committed(spark, log_dir)
    if done is None:
        return src
    return src.join(done.select("url"), on="url", how="left_anti")


def run_with_snapshots(
    src: DataFrame,
    output_dir: str,
    log_dir: str,
    batch_id: str,
    params: Optional[dict] = None,
) -> Dict:
    """One resumable increment: extract everything not yet committed and
    commit it as ``batch_id``. Crash anywhere before the manifest rename →
    the next call redoes exactly the uncommitted work."""
    from dedoc_spark.operators.pipeline import extract_stage

    spark = src.sparkSession
    todo = resume_uncommitted(src, spark, log_dir)
    out = extract_stage(todo, params=params)
    return commit_batch(out, output_dir, log_dir, batch_id)
