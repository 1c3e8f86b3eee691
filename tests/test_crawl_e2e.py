"""End-to-end crawl pipeline: WARC → extract → quality gates → near-dup
removal → snapshot commit, with resume."""

from dedoc_spark.operators.crawl import process_crawl
from dedoc_spark.operators.snapshots import read_committed
from dedoc_spark.sources.warc import build_warc

GOOD = ("<html><body><p>" + " ".join(
    ["the quick brown fox jumps over that lazy dog with style and it ran home to rest"] * 6
) + "</p></body></html>")
GARBAGE = "<html><body><p>### ### … … #### ##</p></body></html>"


def _warc_dir(tmp_path, name, records):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    (d / "part.warc.gz").write_bytes(build_warc(records))
    return str(d)


def test_process_crawl_end_to_end(spark, tmp_path):
    records = [
        {"url": "https://cc.example/good1", "body": GOOD},
        {"url": "https://cc.example/dup-of-good1", "body": GOOD},   # near dup → removed
        {"url": "https://cc.example/garbage", "body": GARBAGE},     # fails gopher gate
    ]
    warcs = _warc_dir(tmp_path, "w1", records)
    out_dir, log_dir = str(tmp_path / "out"), str(tmp_path / "log")

    m = process_crawl(spark, warcs, out_dir, log_dir, "b1")
    assert m["row_count"] == 3 and m["error_count"] == 0  # all rows extracted + committed
    assert m["curated_count"] == 1  # dup removed, garbage gated out
    curated = spark.read.parquet(m["curated_path"])
    assert [r.url for r in curated.collect()] == ["https://cc.example/dup-of-good1"] or \
           [r.url for r in curated.collect()] == ["https://cc.example/good1"]

    # resume: a second increment with one new page processes ONLY that page
    records2 = records + [{"url": "https://cc.example/good2",
                           "body": GOOD.replace("fox", "wolf").replace("dog", "cat")}]
    warcs2 = _warc_dir(tmp_path, "w2", records2)
    m2 = process_crawl(spark, warcs2, out_dir, log_dir, "b2")
    assert m2["row_count"] == 1
    assert read_committed(spark, log_dir).count() == 4
