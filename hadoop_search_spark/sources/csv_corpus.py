"""CSV corpus connector — the other interchange format document
drops actually arrive in.

Same production concerns as the JSONL connector (``sources/jsonl.py``
— schema enforcement, corrupt-line quarantine, deterministic content
ids), same mechanism: ONE text scan + a map-only ``from_csv``
projection with the corrupt marker INSIDE the parse schema. The
shared post-processing (:func:`split_corrupt`,
:func:`with_content_ids`) is imported from the JSONL module — both
connectors emit the identical ``(_parsed, _raw_line)`` shape.

Split-safety contract (the 100 TB concern): this reader treats ONE
LINE as one record, which is what makes the scan splittable — a
worker can start parsing at any newline. Standard CSV quoting allows
embedded newlines, but parsing those requires Spark's
``multiLine=true`` mode, which makes every FILE a single split (a
non-starter for large drops). Corpora with embedded newlines must
escape them at export time (e.g. ``\\n``); a quoted field that does
span lines parses as a corrupt record here and lands in quarantine
for audit, it is not silently mangled.

Reference parity: the reference's KV-text source
(`hadoop_wiki_search/util/KeyValueTextInput.java`) is likewise a
line-oriented delimited reader; CSV generalizes it from 2 columns to
a schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_search_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENT_SCHEMA,
    PARSED_COL,
    RAW_COL,
    split_corrupt,
    with_content_ids,
)

__all__ = [
    "read_csv_corpus",
    "write_csv_corpus",
    "split_corrupt",
    "with_content_ids",
]


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    sep: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read carrying both the parsed struct and
    the raw line; split with :func:`split_corrupt`. No header
    handling — the schema is explicit, so headers are neither needed
    nor written by :func:`write_csv_corpus` (a stray header line
    parses as corrupt and is quarantined, visibly).

    FAILFAST/inference are deliberately avoided for the same reasons
    as in the JSONL connector: inference double-scans and drifts
    between batches, and one bad line must not kill a 100 TB job.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)
    return raw.select(
        F.from_csv(
            F.col("value"),
            full.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": sep,
            },
        ).alias(PARSED_COL),
        F.col("value").alias(RAW_COL),
    )


def write_csv_corpus(
    docs: DataFrame, path: str, mode: str = "overwrite", sep: str = ","
) -> None:
    """Write a corpus as compressed headerless CSV part files —
    re-readable by :func:`read_csv_corpus` with the same schema.
    Embedded separators/quotes are quoted by the writer; embedded
    line breaks would violate the line-oriented contract above — the
    text reader splits on LF, CR, and CRLF alike — so both are
    escaped to literal ``\\n`` / ``\\r`` first (audit-visible,
    reversible for text payloads that never contain the two-char
    sequences)."""
    cleaned = docs
    for f in docs.schema.fields:
        if isinstance(f.dataType, T.StringType):
            cleaned = cleaned.withColumn(
                f.name,
                F.regexp_replace(
                    F.regexp_replace(F.col(f.name), "\n", "\\\\n"),
                    "\r",
                    "\\\\r",
                ),
            )
    cleaned.write.mode(mode).option("compression", "gzip").option(
        "sep", sep
    ).csv(path)
