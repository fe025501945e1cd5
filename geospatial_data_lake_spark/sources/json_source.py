"""JSON document source with corrupt-record capture — S5.

The reference parses JSON metadata documents one object at a time and
treats parse failures as validation errors rather than job failures
(ref: backend/check_stac_metadata/utils.py:132-152, error capture at
utils.py:154-171). The Spark-native equivalent: PERMISSIVE-mode
``spark.read.json`` with an explicit schema and a ``_corrupt_record``
column, split into a clean stream and an error stream so bad documents
route to validation output instead of aborting the scan.

Scale note: an explicit schema is mandatory on the hot path — schema
inference is a second full pass over the data. Corrupt capture adds no
cost to well-formed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON documents into ``(good, corrupt)`` DataFrames.

    ``good`` has exactly ``schema``'s columns; ``corrupt`` has the raw
    unparseable text in ``_corrupt_record``. PERMISSIVE mode requires the
    corrupt column to be cached/materialized before it can be filtered —
    handled here so callers get two clean streams.
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multi_line).lower())
        .json(path)
    )
    # Spark refuses to filter on the corrupt column of a bare json scan
    # (SPARK-21610); a no-op through cache or a materialization barrier is
    # the documented pattern. Keep it lazy with a projection barrier.
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, corrupt


def parse_json_column(
    df: DataFrame, column: str, schema: T.StructType | T.MapType
) -> DataFrame:
    """``from_json`` with corrupt capture for JSON carried in a string
    column (the streaming-friendly variant of S5: file listing arrives as
    rows, payload parsed per-row JVM-side)."""
    parsed = F.from_json(F.col(column), schema)
    return df.withColumn("parsed", parsed).withColumn(
        "parse_ok", parsed.isNotNull() | F.col(column).isNull()
    )
