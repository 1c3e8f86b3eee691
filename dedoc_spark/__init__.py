"""dedoc_spark — a PySpark-native document content-extraction engine.

A brand-new engine with the semantics of ispras/dedoc (reference at
/root/reference): per-document HTML/TXT parsing into lines with
annotations, default structure extraction (pattern chain), tree
construction, and per-url extracted text — expressed as Spark DataFrame
transformations with vectorized Arrow/pandas UDFs, plus the relational
operators a web-scale training-data pipeline needs (dedup, similarity
search, text stats).

Layout
------
core/       pure-Python per-document extraction core (runs inside UDFs)
sources/    deterministic synthetic web_pages generator + readers
operators/  Spark DataFrame operators (extraction stage, dedup, ANN, stats)
functions/  column-expression helpers (JVM-side, no Python in hot path)
streaming/  Structured Streaming wrapper of the extraction stage
"""

__version__ = "0.1.0"
