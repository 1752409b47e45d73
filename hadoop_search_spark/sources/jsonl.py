"""JSONL (newline-delimited JSON) corpus connector — the de-facto
interchange format for training-data corpora.

Reference parity note: the reference ingests its corpus via a
split-boundary-safe XML record reader
(`hadoop_wiki_search/util/XMLInputFormat.java:24-206`); JSONL is the
modern equivalent for document corpora, and Spark's native json
source is already split-safe (one record per line, lines never span
splits after the first). This module adds the production concerns on
top of ``spark.read.json``:

* **schema enforcement** — an explicit document schema, never
  inference (inference scans the data twice and drifts between
  batches);
* **corrupt-record capture** — the raw line is read with the text
  source and parsed with ``from_json`` (malformed → null struct), so
  one bad line in a 100 TB drop doesn't kill the job and bad lines
  are auditable instead of silently dropped. (The built-in
  ``_corrupt_record`` column is deliberately avoided: Spark forbids
  corrupt-only projections over raw files unless the dataset is
  cached first, and caching a 100 TB raw corpus is not a plan.);
* **deterministic doc ids** — synthesized from a content hash when
  the corpus has none (stable across re-runs, unlike
  ``monotonically_increasing_id`` which depends on partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARSED_COL = "_parsed"
RAW_COL = "_raw_line"
CORRUPT_COL = "_corrupt"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Schema-enforced JSONL read carrying both the parsed struct and
    the raw line; split with :func:`split_corrupt`. One text scan —
    parsing is a map-only ``from_json`` projection. The corrupt
    marker lives INSIDE the parse schema (``from_json`` fills it with
    the raw input on parse failure), which distinguishes a malformed
    line from legitimately all-null JSON like ``{}``."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)
    return raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias(PARSED_COL),
        F.col("value").alias(RAW_COL),
    )


def split_corrupt(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): lines ``from_json`` could not parse carry
    the raw input in their corrupt field and are separated out for
    audit; blank lines are ignored."""
    corrupt = F.col(PARSED_COL).getField(CORRUPT_COL)
    nonblank = docs.filter(F.trim(F.col(RAW_COL)) != "")
    clean = (
        nonblank.filter(corrupt.isNull())
        .select(f"{PARSED_COL}.*")
        .drop(CORRUPT_COL)
    )
    quarantine = nonblank.filter(corrupt.isNotNull()).select(
        F.col(RAW_COL).alias("raw_line")
    )
    return clean, quarantine


def with_content_ids(docs: DataFrame) -> DataFrame:
    """Fill missing doc_ids with a 60-bit hash of the FULL row —
    deterministic across re-runs and partitionings (unlike
    ``monotonically_increasing_id``). Existing ids are kept.

    Hashing every column (not just the text) means two id-less rows
    share an id only when they are identical in every field — and
    such full-row duplicates are then collapsed, deterministically,
    since the surviving row is bit-identical whichever one it is.
    This preserves the unique-doc_id invariant downstream operators
    (exact dedup, joins on doc_id) rely on; text-duplicates that
    differ in any other field keep distinct ids and are left for the
    dedup operators to judge. Rows with PRE-EXISTING ids pass through
    untouched (map-only — the collapse shuffle is paid only by the
    id-less slice, so a corpus that ships with ids costs nothing
    here). Random collision probability across distinct rows is
    ~n²/2⁶¹.

    The hash payload is ``to_json(struct(cols))`` — an injection-proof
    encoding (field names kept, strings escaped, null fields omitted
    by name), so no choice of field *values* can make two distinct
    rows serialize identically; a delimiter-joined concat would
    collide on values containing the delimiter."""
    cols = [c for c in docs.columns if c != "doc_id"]
    payload = F.to_json(F.struct(*[F.col(c) for c in cols]))
    h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")
    with_id = docs.filter(F.col("doc_id").isNotNull())
    synthesized = (
        docs.filter(F.col("doc_id").isNull())
        .withColumn("doc_id", h)
        .dropDuplicates()
    )
    return with_id.unionByName(synthesized)


def write_jsonl_corpus(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a corpus back out as compressed JSONL part files."""
    docs.write.mode(mode).option("compression", "gzip").json(path)
