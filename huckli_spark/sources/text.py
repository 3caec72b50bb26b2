"""Text-corpus sources: JSONL and CSV document readers.

Web-scale training corpora arrive as JSONL (one document object per
line — the Common Crawl / WET-derivative convention) or CSV exports,
not parquet. These readers land either format on the SAME canonical
``documents`` schema the rest of the pipeline consumes (dedup,
quality, packing, sampling), with the ingest-layer guarantees the
reference applies to its protobuf sources (huckli-import's
error-drop policy, lib.rs:227-235): malformed records are QUARANTINED
— counted and inspectable — never silently dropped and never fatal.

Spark-first mechanics, no custom parse loop:
- explicit schema (never inferSchema: a schema-inference pass reads
  the whole corpus twice and can flip types between runs),
- PERMISSIVE mode with ``columnNameOfCorruptRecord``: broken lines
  surface as a _corrupt column, split off into a quarantine relation,
- provenance (``file_source``) via input_file_name-equivalent
  metadata column, matching the warehouse convention (A19).

Scale: both readers are plain FileScan-based sources — splittable
(uncompressed), partition-pruned by directory layout, and predicate
pushdown applies to the parsed columns downstream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


@dataclass
class CorpusRead:
    """Parsed docs + quarantined lines, both with provenance."""

    docs: DataFrame
    quarantine: DataFrame  # (file_source, raw)


def _schema_with_corrupt() -> T.StructType:
    return T.StructType(
        list(DOCUMENTS_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )


def _split(parsed: DataFrame) -> CorpusRead:
    # Provenance keeps the last TWO path segments (parent dir + file
    # name): partitioned corpora routinely repeat file names across
    # partition directories (part-00000.jsonl under date=.../), and a
    # bare basename would collapse them into one provenance value.
    parsed = parsed.withColumn(
        "file_source",
        F.array_join(F.slice(F.split(F.col("__path"), "/"), -2, 2), "/"),
    ).drop("__path")
    # Spark refuses plans that read ONLY the corrupt column straight off
    # a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parse
    # must be materialized once. Caching here is also the right ingest
    # shape: good+quarantine both derive from a single pass over the
    # files instead of two scans.
    parsed = parsed.cache()
    # a row is quarantined iff the corrupt column captured its raw text
    bad = parsed.where(F.col(_CORRUPT).isNotNull()).select(
        "file_source", F.col(_CORRUPT).alias("raw")
    )
    good = (
        parsed.where(F.col(_CORRUPT).isNull())
        .drop(_CORRUPT)
        # normalize: n_chars is derivable; fill if the source omitted it
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.length("text")))
    )
    return CorpusRead(docs=good, quarantine=bad)


def read_jsonl_documents(spark: SparkSession, path: str) -> CorpusRead:
    """JSONL corpus → canonical documents (+ quarantine).

    PERMISSIVE JSON parsing: lines that are not valid JSON, or whose
    fields cannot coerce to the schema, land in the corrupt column.
    """
    parsed = (
        spark.read.schema(_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .withColumn("__path", F.col("_metadata.file_path"))
    )
    return _split(parsed)


def read_csv_documents(
    spark: SparkSession, path: str, header: bool = True
) -> CorpusRead:
    """CSV corpus → canonical documents (+ quarantine).

    Quoted multi-line text fields are handled by the CSV source
    (``multiLine``); type-coercion failures quarantine the raw line.
    """
    parsed = (
        spark.read.schema(_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", "true" if header else "false")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
        .withColumn("__path", F.col("_metadata.file_path"))
    )
    return _split(parsed)
