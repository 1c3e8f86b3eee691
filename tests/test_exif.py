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
