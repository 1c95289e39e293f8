"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.B
R16 — optional; the north rule is a batch job with checkpoint resume)."""
