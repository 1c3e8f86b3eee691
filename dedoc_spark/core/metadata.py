"""Per-format metadata extractors.

References:
  - BaseMetadataExtractor (metadata_extractors/concrete_metadata_extractors/
    base_metadata_extractor.py:33-71): file stats — replaced here by input
    table columns (url, warc_ts, length(html)); see pipeline metrics.
  - DocxMetadataExtractor (docx_metadata_extractor.py): docProps/core.xml
    fields (title, author/creator, subject, created/modified...).
  - PdfMetadataExtractor (pdf_metadata_extractor.py): the /Info dict
    (Producer, Author, Title, CreationDate...) with ISO/IEC 8824 date
    conversion to unixtime (utils/utils.py:234-255).
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import datetime, timedelta, timezone
from typing import Dict, Optional
from xml.etree import ElementTree as ET

_PDF_DATE_RE = re.compile(
    r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?([+\-Zz])?(\d{2})?'?(\d{2})?"
)


def convert_pdf_date(date_str: str) -> Optional[int]:
    """'D:YYYYMMDDHHmmSSOHH'mm'' → unix timestamp (utils.py:234-255)."""
    m = _PDF_DATE_RE.match(date_str.strip())
    if not m:
        return None
    parts = [m.group(i) for i in range(1, 7)]
    year = int(parts[0])
    month = int(parts[1] or 1)
    day = int(parts[2] or 1)
    hour = int(parts[3] or 0)
    minute = int(parts[4] or 0)
    second = int(parts[5] or 0)
    dt = datetime(year, month, day, hour, minute, second, tzinfo=timezone.utc)
    sign, oh, om = m.group(7), m.group(8), m.group(9)
    if sign in ("+", "-") and oh:
        offset = timedelta(hours=int(oh), minutes=int(om or 0))
        dt = dt - offset if sign == "+" else dt + offset
    return int(dt.timestamp())


def extract_pdf_metadata(payload: bytes) -> Dict[str, str]:
    """The /Info dictionary fields; dates converted to unixtime strings."""
    out: Dict[str, str] = {}
    info = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", payload)
    obj = None
    if info:
        oid = info.group(1)
        m = re.search(oid + rb"\s+0\s+obj(.*?)endobj", payload, re.S)
        obj = m.group(1) if m else None
    if obj is None:  # inline Info dict or none
        return out
    for key in (b"Title", b"Author", b"Subject", b"Producer", b"Creator"):
        m = re.search(rb"/" + key + rb"\s*\(((?:\\.|[^\\)])*)\)", obj)
        if m:
            out[key.decode().lower()] = m.group(1).decode("latin-1")
    for key in (b"CreationDate", b"ModDate"):
        m = re.search(rb"/" + key + rb"\s*\(([^)]*)\)", obj)
        if m:
            ts = convert_pdf_date(m.group(1).decode("latin-1"))
            if ts is not None:
                out[key.decode().lower()] = str(ts)
    return out


_CORE_FIELDS = {
    "{http://purl.org/dc/elements/1.1/}title": "title",
    "{http://purl.org/dc/elements/1.1/}creator": "creator",
    "{http://purl.org/dc/elements/1.1/}subject": "subject",
    "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}lastModifiedBy": "last_modified_by",
    "{http://purl.org/dc/terms/}created": "created",
    "{http://purl.org/dc/terms/}modified": "modified",
}


def extract_docx_metadata(payload: bytes) -> Dict[str, str]:
    """docProps/core.xml fields (docx_metadata_extractor.py semantics)."""
    out: Dict[str, str] = {}
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            if "docProps/core.xml" not in zf.namelist():
                return out
            root = ET.fromstring(zf.read("docProps/core.xml"))
    except Exception:
        return out
    for el in root.iter():
        key = _CORE_FIELDS.get(el.tag)
        if key and el.text:
            out[key] = el.text
    return out
