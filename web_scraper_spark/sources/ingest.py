"""Schema-enforced ingestion for text-corpus tables: JSONL / CSV / parquet
in, (valid rows, quarantined raw records) out.

The engine's state tables are parquet/snapshot-native, but a corpus
arrives however the upstream produced it — JSONL dumps, CSV exports. Two
rules make that safe at 100 TB:

  * **Explicit schema, never inference.** ``inferSchema``/schema-less JSON
    reads scan the whole input once before the real job starts — a full
    extra pass over 100 TB — and infer different types run-to-run on dirty
    data. Every reader here takes the target StructType up front, so the
    scan is single-pass and the output schema is stable by construction.
  * **Quarantine, don't abort; quarantine, don't silently drop.** One
    malformed record among 10^10 must neither kill the job (FAILFAST)
    nor vanish (DROPMALFORMED). PERMISSIVE mode + a corrupt-record column
    splits the scan into valid rows and raw quarantined lines that an
    operator can inspect and replay.

Reference parity: the reference loads its inputs with bare json.load and
crashes or silently mis-parses on damage (progress corruption handling is
"start over", new/progress_manager.py); quarantine-style ingestion is the
distributed replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the driver testdata `documents` table shape (TESTDATA.md)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"

#: parsed frames persisted by the current ingest — Spark refuses queries
#: whose referenced columns are ONLY the corrupt-record column
#: (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the split
#: must run over a materialized parse; released via release_ingest_caches()
_PERSISTED_INGESTS: list[DataFrame] = []


def release_ingest_caches() -> None:
    """Unpersist parsed frames left behind by prior read_with_quarantine
    calls (call after both the valid and quarantine sides are consumed)."""
    while _PERSISTED_INGESTS:
        _PERSISTED_INGESTS.pop().unpersist()


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "jsonl",
    csv_header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read ``path`` as ``fmt`` (``jsonl`` | ``csv`` | ``parquet``) with the
    given schema. Returns ``(valid, quarantine)``:

      * ``valid`` — rows matching the schema, exactly ``schema``'s columns;
      * ``quarantine`` — one string column ``raw`` holding each record that
        failed to parse, for offline inspection/replay (empty for parquet,
        which is schema-checked at file level).

    The corrupt-record column must be part of the read schema for Spark to
    populate it (added here, stripped before returning), and — Spark
    caveat — any query whose referenced columns reduce to ONLY the corrupt
    column is disallowed, so the parse is persisted (MEMORY_AND_DISK,
    spill-safe) before splitting; call ``release_ingest_caches()`` once
    both sides are consumed. At full corpus scale prefer consuming both
    sides in the same maintenance window — write ``valid`` straight to the
    target table in the first action; the quarantine action then reads the
    persisted/spilled parse, never the raw input twice.
    """
    if fmt == "parquet":
        df = spark.read.schema(schema).parquet(path)
        empty = spark.createDataFrame([], "raw string")
        return df.select(*[f.name for f in schema.fields]), empty
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    if fmt == "jsonl":
        df = (
            spark.read.schema(read_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .json(path)
        )
    elif fmt == "csv":
        df = (
            spark.read.schema(read_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .option("header", str(csv_header).lower())
            .csv(path)
        )
    else:
        raise ValueError(f"unknown ingest format: {fmt!r}")
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_INGESTS.append(df)
    bad = F.col(_CORRUPT).isNotNull()
    valid = df.filter(~bad).select(*[f.name for f in schema.fields])
    quarantine = df.filter(bad).select(F.col(_CORRUPT).alias("raw"))
    return valid, quarantine


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> tuple[DataFrame, DataFrame]:
    """Documents-table ingestion in any supported format; the analytics
    suite runs unchanged on the ``valid`` side."""
    return read_with_quarantine(spark, path, DOCUMENTS_SCHEMA, fmt=fmt)
