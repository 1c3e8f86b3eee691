"""Spark DataFrame operators: the extraction stage and the web-scale
training-data pipeline operators (dedup, similarity, text stats)."""
