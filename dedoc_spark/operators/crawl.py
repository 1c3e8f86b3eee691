"""End-to-end crawl processing: the whole engine in one resumable call.

  WARC files → web_pages rows → extraction (error-channel, zero-shuffle)
  → Gopher document + repetition gates on the extracted text
  → near-dup removal (LSH candidates → exact verify → components →
    min-id representatives)
  → snapshot commit (atomic manifest, crash-safe resume)

Every stage is the independently-tested operator; this module only wires
them. Rerunning with the same log_dir resumes: committed urls are dropped
before extraction, so a crashed run redoes exactly the uncommitted work.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def quality_gate(extracted: DataFrame, text_col: str = "text_extracted", id_col: str = "url") -> DataFrame:
    """Gopher document + repetition rules over extracted text: keeps rows
    passing both; error-channel rows (no text) are dropped here — they're
    already recorded by the extraction output the caller commits."""
    from dedoc_spark.operators.textstats import gopher_quality_flags, gopher_repetition_flags

    candidates = extracted.filter(F.col("error").isNull() & (F.length(text_col) > 0))
    doc_flags = gopher_quality_flags(candidates, text_col, id_col).filter("gopher_pass")
    rep_flags = gopher_repetition_flags(candidates, text_col, id_col).filter("rep_pass")
    return (
        candidates.join(doc_flags.select(id_col), id_col)
        .join(rep_flags.select(id_col), id_col)
    )


def process_crawl(
    spark: SparkSession,
    warc_path: str,
    output_dir: str,
    log_dir: str,
    batch_id: str,
    dedup_threshold: float = 0.8,
    apply_quality_gate: bool = True,
) -> Dict:
    """One resumable crawl increment. Writes two datasets under output_dir:

      batch=<id>/            every extraction row (incl. error channel)
      curated/batch=<id>/    quality-gated, near-dup-removed documents

    and commits the manifest last (the atomic point). Returns the manifest
    with curated counts attached."""
    import os

    from dedoc_spark.operators.dedup import dedup_corpus
    from dedoc_spark.operators.pipeline import extract_stage
    from dedoc_spark.operators.snapshots import commit_batch, resume_uncommitted
    from dedoc_spark.sources.warc import read_warc

    pages = read_warc(spark, warc_path)
    todo = resume_uncommitted(pages, spark, log_dir)
    extracted = extract_stage(todo)

    curated = quality_gate(extracted) if apply_quality_gate else extracted.filter(F.col("error").isNull())
    deduped = dedup_corpus(curated, text_col="text_extracted", id_col="url", threshold=dedup_threshold)
    kept = deduped.filter("is_representative").drop("comp", "is_representative")
    curated_path = os.path.join(output_dir, "curated", f"batch={batch_id}")
    # observe() rides the write job itself — no second scan of the curated
    # set just to count it
    observation = Observation(f"curated_{batch_id}")
    kept.observe(observation, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(curated_path)
    n_curated = observation.get["n"]

    manifest = commit_batch(
        extracted, output_dir, log_dir, batch_id,
        extra={"curated_path": curated_path, "curated_count": int(n_curated)},
    )
    return manifest
