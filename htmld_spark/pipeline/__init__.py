"""Batch extraction pipeline: scan → resume anti-join → salted repartition →
mapInArrow extract → write + lineage/manifest (SURVEY.md §2.B, §3.4)."""
