"""End-to-end Spark pipeline tests: parquet → extract_stage → outputs.

Key invariant: the Spark path produces byte-identical output to the plain
function path, and the same output at any parallelism/partitioning."""

import json

import pytest

from dedoc_spark.core.document import extract_document
from dedoc_spark.operators.pipeline import (
    extract_stage,
    extract_with_skew_routing,
    lineage_metrics,
    lines_table,
    nodes_table,
    resume_anti_join,
)
from dedoc_spark.sources.web_pages import ensure_web_pages, make_row

N = 300


@pytest.fixture(scope="module")
def web_pages(spark):
    path = ensure_web_pages(N)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def extracted(spark, web_pages):
    return extract_stage(web_pages, salt_partitions=8).cache()


def test_row_count_and_no_errors(extracted):
    rows = extracted.collect()
    assert len(rows) == N
    errors = [r for r in rows if r.error is not None]
    assert errors == []


def test_spark_matches_plain_function(extracted):
    """Byte identity: Spark output per url == plain-Python output per url."""
    got = {r.url: r for r in extracted.collect()}
    for i in range(0, N, 7):
        row = make_row(i)
        expected = extract_document(row["url"], row["html"], row["text"])
        r = got[row["url"]]
        assert r.text_extracted == expected["text_extracted"], row["url"]
        assert r.lines_json == expected["lines_json"], row["url"]
        assert r.tree_json == expected["tree_json"], row["url"]


def test_partitioning_invariance(spark, web_pages, extracted):
    """Same results regardless of salting/partition count."""
    base = {r.url: r.text_extracted for r in extracted.collect()}
    alt = {
        r.url: r.text_extracted
        for r in extract_stage(web_pages.repartition(3), salt_partitions=None).collect()
    }
    assert base == alt


def test_skew_routing_same_results(spark, web_pages, extracted):
    base = {r.url: r.text_extracted for r in extracted.collect()}
    routed = {
        r.url: r.text_extracted
        for r in extract_with_skew_routing(
            web_pages, salt_partitions=8, big_doc_threshold=20_000
        ).collect()
    }
    assert base == routed


def test_lines_table_explode(spark, extracted):
    lt = lines_table(extracted)
    assert lt.columns[:4] == ["url", "line_id", "page_id", "line"]
    total = lt.count()
    sum_n = extracted.agg({"n_lines": "sum"}).collect()[0][0]
    assert total == sum_n
    # line_id dense per url starting at 0
    from pyspark.sql import functions as F

    bad = (
        lt.groupBy("url")
        .agg(F.min("line_id").alias("mn"), F.max("line_id").alias("mx"), F.count("*").alias("c"))
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("c") - 1))
        .count()
    )
    assert bad == 0


def test_nodes_table(spark, extracted):
    nt = nodes_table(extracted)
    roots = nt.filter("node_id = '0'").count()
    assert roots == N
    assert nt.filter("parent_id is null and node_id <> '0'").count() == 0


def test_lineage_metrics(spark, extracted):
    m = lineage_metrics(extracted).collect()
    assert sum(r.url_count for r in m) == N
    assert all(r.errors == 0 for r in m)


def test_resume_anti_join(spark, web_pages):
    done = extract_stage(web_pages.limit(100)).select("url")
    remaining = resume_anti_join(web_pages, done)
    assert remaining.count() == N - 100


def test_projection_pushdown(spark, web_pages):
    """The extract stage reads only url/html/text from the scan."""
    plan = extract_stage(web_pages)._jdf.queryExecution().executedPlan().toString()
    assert "warc_ts" not in plan
    assert "lang" not in plan


def test_params_surface(spark, web_pages):
    """The reference's parameters (api_args.py subset): structure_type,
    patterns, handle_invisible_table flow through the Spark stage."""
    import json as jsonlib

    from pyspark.sql import functions as F

    from dedoc_spark.operators.pipeline import extract_stage as ex

    sample = web_pages.filter(F.length("html") > 0).limit(5)
    linear = ex(sample, params={"structure_type": "linear"}).collect()
    for r in linear:
        tree = jsonlib.loads(r.tree_json)
        # linear: no grandchildren
        for child in tree["subparagraphs"]:
            assert child["subparagraphs"] == []

    pat = ex(
        sample,
        params={"patterns": [{"name": "regexp", "regexp": "^.*", "line_type": "custom", "level_1": 1, "can_be_multiline": "false"}]},
    ).collect()
    for r in pat:
        lines = jsonlib.loads(r.lines_json)
        assert all(ln["hl"]["line_type"] == "custom" for ln in lines)


def test_streaming_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState dedup keeps exactly the first row per content
    fingerprint ACROSS micro-batches: the duplicate arrives in a later file
    (= later micro-batch with maxFilesPerTrigger=1) and is dropped."""
    import time

    from dedoc_spark.streaming import streaming_dedup

    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(
        [("u1", "same content here"), ("u2", "other content")], "url string, text string"
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame(
        [("u3", "same   CONTENT here"), ("u4", "third content")], "url string, text string"
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    urls = sorted(r.url for r in rows)
    # u3 normalizes to u1's fingerprint (case+whitespace fold) → dropped
    assert urls == ["u1", "u2", "u4"]


def test_streaming_rollup_windowed(spark, tmp_path):
    """Watermarked event-time windows: two 1-hour windows, counts per lang;
    append mode emits only watermark-closed windows (all of them under
    availableNow once the source is exhausted)."""
    from datetime import datetime

    from dedoc_spark.streaming import streaming_rollup

    src = tmp_path / "roll_src"
    src.mkdir()
    rows = [
        ("u1", datetime(2026, 1, 1, 10, 5), bytearray(b"<p>a</p>"), "", "en"),
        ("u2", datetime(2026, 1, 1, 10, 35), bytearray(b"<p>bb</p>"), "", "en"),
        ("u3", datetime(2026, 1, 1, 10, 50), bytearray(b"<p>c</p>"), "", "ru"),
        ("u4", datetime(2026, 1, 1, 11, 10), bytearray(b"<p>dd</p>"), "", "en"),
        ("u5", datetime(2026, 1, 1, 14, 0), bytearray(b""), "", "en"),  # advances watermark
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).parquet(str(src) + "/*/")
    q = (
        streaming_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_sink")
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.hour, r.lang): (r.n_docs, r.html_bytes)
        for r in spark.sql("SELECT * FROM rollup_sink").collect()
    }
    assert got[(10, "en")] == (2, 17)
    assert got[(10, "ru")] == (1, 8)
    assert got[(11, "en")] == (1, 9)


def test_streaming_near_dedup_stateful(spark, tmp_path):
    """Band-key state survives micro-batches: a near-duplicate arriving in
    a LATER batch still collides with the first-seen document's bands."""
    from dedoc_spark.streaming import streaming_near_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "near_src"
    src.mkdir()
    spark.createDataFrame(
        [("u1", base), ("u2", "totally different words entirely here now")],
        "url string, text string",
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame(
        [("u3", base), ("u4", "yet another unrelated body of text")],
        "url string, text string",
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        streaming_near_dedup(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_sink")
        .option("checkpointLocation", str(tmp_path / "near_ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM near_dedup_sink").collect()
    pairs = {(r.url, r.dup_of) for r in rows}
    assert pairs == {("u3", "u1")}  # exact near-dup across batches


def test_streaming_near_dedup_verify_stage(spark, tmp_path):
    """verify_threshold adds the batch path's verify stage to the stream:
    a document that COLLIDES on band keys but is dissimilar (signature
    match fraction below threshold) is suppressed instead of emitted,
    while a true near-duplicate passes with its est_jaccard; state keys
    are unchanged (per band key), only the canonical signature rides
    along."""
    from dedoc_spark.streaming import streaming_near_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    # shares the first few shingles with base → collides on some single-row
    # bands, but only 3/16 signature rows agree (est 0.1875)
    partial = "alpha beta gamma delta mu nu xi omicron pi rho"
    src = tmp_path / "verify_src"
    src.mkdir()
    spark.createDataFrame(
        [("A", base)], "url string, text string"
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame(
        [("B", near), ("C", partial)], "url string, text string"
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        streaming_near_dedup(stream, bands=16, verify_threshold=0.5)
        .writeStream.format("memory")
        .queryName("near_dedup_verify_sink")
        .option("checkpointLocation", str(tmp_path / "verify_ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM near_dedup_verify_sink").collect()
    assert {(r.url, r.dup_of) for r in rows} == {("B", "A")}  # C suppressed
    assert all(abs(r.est_jaccard - 0.8125) < 1e-9 for r in rows)
