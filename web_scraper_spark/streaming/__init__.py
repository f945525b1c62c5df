"""Structured Streaming layer (SURVEY.md §2.9).

The reference's crawl loop is a hand-rolled micro-batch stream; the batch
engine (plans/crawl.py) keeps that explicit-loop shape for Iceberg-style
multi-table commits. This package covers the genuinely streaming pieces:
continuous metrics over the landing fetch/event log with watermarks +
event-time windows, runnable either continuously or as availableNow
catch-up batches.
"""
