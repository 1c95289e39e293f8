"""Spark-facing functions: Arrow-batched extraction UDFs plus training-data
pipeline functions (dedup, similarity, text analysis, multimodal)."""
