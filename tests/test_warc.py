"""WARC source: Common-Crawl-style archives → web_pages rows → extraction."""

from datetime import datetime, timezone

from dedoc_spark.sources.warc import build_warc, iter_warc_records, read_warc, warc_response_rows

RECORDS = [
    {"url": "https://cc.example/a", "date": "2026-02-03T04:05:06Z",
     "body": "<html><body><h1>Page A</h1><p>alpha body</p></body></html>"},
    {"url": "https://cc.example/req", "type": "request", "body": "GET / HTTP/1.1", "http": False},
    {"url": "https://cc.example/b", "date": "2026-02-03T05:00:00Z",
     "body": "<html><body><p>beta body</p></body></html>"},
]


def test_warc_parse_plain_and_gzip():
    for gz in (False, True):
        payload = build_warc(RECORDS, per_record_gzip=gz)
        recs = list(iter_warc_records(payload))
        assert len(recs) == 3
        rows = warc_response_rows(payload)
        assert [r["url"] for r in rows] == ["https://cc.example/a", "https://cc.example/b"]
        assert rows[0]["warc_ts"] == datetime(2026, 2, 3, 4, 5, 6, tzinfo=timezone.utc)
        # HTTP headers stripped: payload starts at the html
        assert rows[0]["html"].startswith(b"<html>")
        assert b"alpha body" in rows[0]["html"]


def test_read_warc_spark_and_extract(spark, tmp_path):
    from pyspark.sql import functions as F

    from dedoc_spark.operators.pipeline import extract_stage

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "part1.warc.gz").write_bytes(build_warc(RECORDS))
    (warc_dir / "part2.warc.gz").write_bytes(build_warc([
        {"url": "https://cc.example/c", "body": "<html><body><p>gamma body</p></body></html>"},
    ]))
    pages = read_warc(spark, str(warc_dir))
    assert pages.count() == 3
    out = {r.url: r for r in extract_stage(pages).collect()}
    assert "alpha body" in out["https://cc.example/a"].text_extracted
    assert "gamma body" in out["https://cc.example/c"].text_extracted
    assert all(r.error is None for r in out.values())
    # the plan is scan → explode → extract, no Exchange
    plan = extract_stage(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
