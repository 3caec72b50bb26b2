"""SQL function registration — the ``spark.udf.register`` /
``CREATE FUNCTION`` surface (SURVEY §2.B, UDF row).

The reference exposes its scalar kernels only inside the ingest
projections; a DuckDB user querying the warehouse has DuckDB's own
function library. Our warehouse user gets Spark SQL's library PLUS the
huckli-specific kernels as first-class SQL functions:

    SELECT helium_pubkey(key_bytes), uuid16(id_bytes),
           ts_heuristic(epoch_col), proto_decimal(amount_str)
    FROM ...

Expression kernels register as Spark 4 SQL scalar UDFs (``CREATE
TEMPORARY FUNCTION ... RETURN <expr>``) — they resolve to Catalyst
expressions and stay inside whole-stage codegen. Only base58check is a
Python UDF (bignum conversion, no JVM builtin), Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_FUNCTIONS = {
    # S6 — 16-byte blob -> canonical hyphenated uuid (mirrors keys.uuid16)
    "uuid16": """
        CREATE OR REPLACE TEMPORARY FUNCTION uuid16(b BINARY)
        RETURNS STRING
        RETURN CASE WHEN length(lower(hex(b))) = 32 THEN concat_ws('-',
            substring(lower(hex(b)), 1, 8), substring(lower(hex(b)), 9, 4),
            substring(lower(hex(b)), 13, 4), substring(lower(hex(b)), 17, 4),
            substring(lower(hex(b)), 21, 12)) END
    """,
    # S2/S3/S4 — epoch conversions + sec-vs-ms heuristic @1e12
    "ts_seconds": """
        CREATE OR REPLACE TEMPORARY FUNCTION ts_seconds(x BIGINT)
        RETURNS TIMESTAMP RETURN timestamp_seconds(x)
    """,
    "ts_millis": """
        CREATE OR REPLACE TEMPORARY FUNCTION ts_millis(x BIGINT)
        RETURNS TIMESTAMP RETURN timestamp_millis(x)
    """,
    "ts_heuristic": """
        CREATE OR REPLACE TEMPORARY FUNCTION ts_heuristic(x BIGINT)
        RETURNS TIMESTAMP
        RETURN CASE WHEN x > 1000000000000 THEN timestamp_millis(x)
                    ELSE timestamp_seconds(x) END
    """,
    # S5 — decimal-as-string with silent 0.0 default
    "proto_decimal": """
        CREATE OR REPLACE TEMPORARY FUNCTION proto_decimal(s STRING)
        RETURNS DOUBLE RETURN coalesce(try_cast(s AS DOUBLE), 0.0d)
    """,
    # portable 60-bit md5 hash (dedup sketches)
    "h60": """
        CREATE OR REPLACE TEMPORARY FUNCTION h60(s STRING)
        RETURNS BIGINT
        RETURN cast(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    """,
}


def register_all(spark: SparkSession) -> list[str]:
    """Register every huckli kernel for use in ``spark.sql``; returns
    the registered names."""
    from pyspark.sql.functions import pandas_udf

    from huckli_spark.functions.keys import _pubkey_batch

    # S1 — the one genuine Python UDF (Arrow-batched)
    spark.udf.register("helium_pubkey", pandas_udf(_pubkey_batch, "string"))
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return ["helium_pubkey", *_SQL_FUNCTIONS]
