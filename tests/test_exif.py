"""EXIF metadata extraction (image_metadata_extractor.py field set) over
hand-built JPEG fixtures — pure-python TIFF IFD walk, no PIL."""

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.metadata import extract_image_metadata
from dedoc_spark.sources.media_fixture import build_jpeg_exif

FIELDS = {
    "Make": "TestCam", "Model": "X100", "Software": "fw1.2",
    "DateTime": "2021:06:05 10:20:30", "Orientation": 6,
    "ExifImageWidth": 640, "ExifImageHeight": 480,
    "DateTimeOriginal": "2020:01:02 03:04:05",
}


def test_exif_fields_roundtrip():
    got = extract_image_metadata(build_jpeg_exif(FIELDS))
    assert got["make"] == "TestCam" and got["model"] == "X100"
    assert got["software"] == "fw1.2"
    assert got["orientation"] == "6"
    assert got["exif_image_width"] == "640" and got["exif_image_height"] == "480"
    assert got["date_time"] == "1622888430"  # 2021-06-05T10:20:30 UTC
    assert got["date_time_original"] == "1577934245"


def test_exif_absent_or_broken():
    assert extract_image_metadata(b"\xff\xd8\xff\xd9") == {}  # no APP1
    assert extract_image_metadata(b"not an image") == {}
    assert extract_image_metadata(b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00\xff\xd9") == {}


def test_media_row_carries_exif():
    d = extract_document("https://x/photo.jpg", build_jpeg_exif(FIELDS), None)
    assert d["error"] == "needs_decoder:image/jpeg"
    assert "exif.make=TestCam" in d["warnings"]
    assert "exif.orientation=6" in d["warnings"]


def test_image_exif_operator(spark):
    from dedoc_spark.operators.multimodal import image_exif

    rows = [(1, bytearray(build_jpeg_exif(FIELDS))), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id bigint, media binary")
    out = {r.media_id: r.exif for r in image_exif(df).collect()}
    assert out[1]["make"] == "TestCam" and out[1]["exif_image_width"] == "640"
    assert out[2] == {}


def test_with_document_metadata_operator(spark):
    """Format-dispatched metadata stage over mixed payloads."""
    from dedoc_spark.operators.multimodal import with_document_metadata
    from dedoc_spark.sources.office_fixture import build_ole2, build_summary_info

    si = build_summary_info({"title": "Legacy title", "created_time": 1700000000})
    ole = build_ole2({"Workbook": b"\x09\x08" + b"\x00" * 64, "\x05SummaryInformation": si})
    pdf_bytes = (b"%PDF-1.4\n1 0 obj\n<< /Title (PDF doc) >>\nendobj\n"
                 b"trailer\n<< /Info 1 0 R >>\n")
    rows = [
        ("https://m/a.xls", bytearray(ole)),
        ("https://m/b.pdf", bytearray(pdf_bytes)),
        ("https://m/c.jpg", bytearray(build_jpeg_exif(FIELDS))),
        ("https://m/d.html", bytearray(b"<p>no metadata</p>")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.metadata for r in with_document_metadata(df).collect()}
    assert got["https://m/a.xls"]["title"] == "Legacy title"
    assert got["https://m/b.pdf"]["title"] == "PDF doc"
    assert got["https://m/c.jpg"]["make"] == "TestCam"
    assert got["https://m/d.html"] == {}
