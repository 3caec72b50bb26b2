"""huckli_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of novalabsxyz/huckli.

The reference (studied at /root/reference) is a Rust batch-ETL pipeline
that streams gzip length-delimited protobuf files from S3 into an
embedded DuckDB warehouse and delegates all analytics to DuckDB SQL.
This package re-expresses that capability Spark-first:

- ``huckli_spark.session``   — SparkSession factory (UTC, AQE) — ref
  huckli-db/src/lib.rs:8-14 (``SET TimeZone='UTC'``).
- ``huckli_spark.sources``   — the custom source layer: S3/file listing
  with lower-bound pushdown, gzip + length-delimited framing, protobuf
  wire decode (ref huckli-s3/src/lib.rs, huckli-import/src/lib.rs).
- ``huckli_spark.ingest``    — declarative table registry (replaces the
  derive macro huckli-import-derive/src/lib.rs), demux/explode writers,
  files_processed checkpoint semantics (huckli-db/src/lib.rs:16-56).
- ``huckli_spark.functions`` — scalar kernels: base58check, uuid16,
  sec/ms timestamp heuristic, proto-decimal default (S1-S13 in SURVEY).
- ``huckli_spark.queries``   — the parity query surface (SURVEY §2.B):
  every relational capability the reference delegates to DuckDB,
  expressed as Spark DataFrame plans with ANSI-SQL oracles.
- ``huckli_spark.operators`` — large-scale training-data-pipeline
  operators: dedup (exact/minhash-LSH/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"
