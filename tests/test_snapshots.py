"""Snapshot commit-log semantics: atomic manifest = the commit point;
uncommitted data is invisible and re-done on resume (the Iceberg-snapshot
resume protocol shape, north rule)."""

import json
import os

from dedoc_spark.operators.snapshots import (
    commit_batch,
    committed_manifests,
    read_committed,
    resume_uncommitted,
    run_with_snapshots,
)


def _src(spark, ids):
    return spark.createDataFrame(
        [(f"https://s/{i}.html", bytearray(f"<p>doc {i}</p>".encode()), "") for i in ids],
        "url string, html binary, text string",
    )


def test_commit_resume_cycle(spark, tmp_path):
    out_dir, log_dir = str(tmp_path / "out"), str(tmp_path / "log")
    m1 = run_with_snapshots(_src(spark, range(0, 5)), out_dir, log_dir, "b1")
    assert m1["row_count"] == 5 and m1["error_count"] == 0
    assert m1["partition_metrics"], "manifest must carry per-partition lineage"

    # second increment sees 5 committed urls and processes only the 3 new
    m2 = run_with_snapshots(_src(spark, range(0, 8)), out_dir, log_dir, "b2")
    assert m2["row_count"] == 3

    done = read_committed(spark, log_dir)
    assert done.count() == 8
    assert done.select("url").distinct().count() == 8


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """Simulated crash: data parquet written, manifest never renamed —
    readers must not see it; resume must redo those urls."""
    from dedoc_spark.operators.pipeline import extract_stage

    out_dir, log_dir = str(tmp_path / "out"), str(tmp_path / "log")
    run_with_snapshots(_src(spark, [0, 1]), out_dir, log_dir, "b1")
    # crashed attempt: parquet exists, no manifest
    extract_stage(_src(spark, [2, 3])).write.parquet(os.path.join(out_dir, "batch=crashed"))
    assert read_committed(spark, log_dir).count() == 2
    todo = resume_uncommitted(_src(spark, [0, 1, 2, 3]), spark, log_dir)
    assert sorted(r.url for r in todo.collect()) == ["https://s/2.html", "https://s/3.html"]


def test_commit_is_idempotent(spark, tmp_path):
    out_dir, log_dir = str(tmp_path / "out"), str(tmp_path / "log")
    from dedoc_spark.operators.pipeline import extract_stage

    out = extract_stage(_src(spark, [0, 1, 2]))
    m1 = commit_batch(out, out_dir, log_dir, "b1")
    m2 = commit_batch(out, out_dir, log_dir, "b1")  # replay → no-op
    assert m1["committed_at"] == m2["committed_at"]
    assert len(committed_manifests(log_dir)) == 1


def test_manifest_is_valid_json_with_metrics(spark, tmp_path):
    out_dir, log_dir = str(tmp_path / "out"), str(tmp_path / "log")
    run_with_snapshots(_src(spark, [0]), out_dir, log_dir, "b1")
    path = os.path.join(log_dir, "b1.manifest.json")
    with open(path) as f:
        m = json.load(f)
    assert {"batch_id", "data_path", "row_count", "error_count", "partition_metrics", "committed_at"} <= set(m)
