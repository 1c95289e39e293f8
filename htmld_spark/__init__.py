"""htmld_spark — a from-scratch, PySpark-native web-text extraction engine.

Re-expresses the *capabilities* of the reference library
``eBookingServices/htmld`` (a forgiving single-node HTML parser / DOM /
CSS-selector library in D) as a distributed, Arrow-vectorized extraction
pipeline (see SURVEY.md):

- ``htmld_spark.engine``    — pure-Python HTML engine (tokenizer, arena DOM,
  CSS selectors, text/span extraction); importable and testable without Spark.
- ``htmld_spark.functions`` — Spark-facing Arrow-batched UDFs plus
  training-data functions (dedup, similarity, text analysis, multimodal).
- ``htmld_spark.pipeline``  — the batch extraction job: scan → anti-join
  resume manifest → salted repartition → mapInArrow extract → write + lineage.
- ``htmld_spark.streaming`` — optional Structured Streaming variant.

No code is ported from the reference; semantics are re-derived from public
knowledge and pinned by the fixture corpus (FIXTURES.md).
"""

ENGINE_VERSION = "htmld-spark-0.1.0"
