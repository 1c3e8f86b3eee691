"""Input sources: deterministic synthetic web_pages generation (FIXTURES.md)
and parquet readers for the driver-provided testdata tables."""
