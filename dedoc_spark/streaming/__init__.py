"""Structured Streaming wrapper of the extraction stage.

The reference is strictly batch (SURVEY.md §2.13); this is the new
engine's streaming front door for continuous crawls: readStream on the
web_pages source → the same mapInPandas extraction (mapInPandas works
unchanged on streaming DataFrames) → writeStream with checkpointing.
Exactly-once comes from the sink checkpoint + deterministic extraction
(same url+bytes → same output bytes), so replays are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dedoc_spark.operators.pipeline import EXTRACT_SCHEMA, bootstrapped

WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_web_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Attach the extraction stage to a streaming web_pages DataFrame."""
    cols = [c for c in ("url", "html", "text") if c in stream_df.columns]
    return stream_df.select(*cols).mapInPandas(bootstrapped("_extract_batches"), schema=EXTRACT_SCHEMA)


def start_extraction_stream(
    stream_df: DataFrame, out_path: str, checkpoint: str, trigger_once: bool = True
):
    """writeStream with checkpoint; trigger_once for batch-incremental runs
    (the streaming analogue of the anti-join resume)."""
    writer = (
        extract_stream(stream_df)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
