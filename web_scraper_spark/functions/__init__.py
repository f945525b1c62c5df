"""Scalar column functions — the reference's per-row Python (SURVEY.md §2.8)
re-expressed as JVM-side column expressions or Arrow-batched pandas UDFs."""
