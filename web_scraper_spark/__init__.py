"""web_scraper_spark — a PySpark-native crawl-frontier + fetch-scheduler engine.

A from-scratch rebuild of the capabilities of the reference scraper
(PrathamBhavsar/web-scraper) as idiomatic Spark: the reference's hand-rolled
page loop, seen-set dict, progress.json checkpointing and per-row Python
extraction (see SURVEY.md) become DataFrame operators — window-ranked
micro-batches, anti-joins against a partitioned seen-set, vectorized
Arrow/pandas UDFs for all scalar work, and snapshot-committed state tables.

Layout:
  session     — SparkSession factory tuned for local[N] and cluster use
  schemas     — StructTypes for payload / frontier / seen / failures / robots
  datagen     — deterministic synthetic fixtures (FIXTURES.md), seed=42
  functions/  — scalar column functions (url canonicalization, date/views
                parsing, error classification, image codec + phash)
  operators/  — relational building blocks (dedup, frontier ranking,
                politeness partitioning, quality top-1, text dedup,
                similarity search, text stats)
  plans/      — end-to-end crawl pipeline (schedule → dedup → fetch →
                validate → commit → resume)
  sources/    — synthetic remote store (fetch stage) + snapshot table layer
"""

__version__ = "0.1.0"
