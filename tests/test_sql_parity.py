"""SQL-surface parity: the engine is not DataFrame-only. Every oracle
string that parses in Spark SQL (pure-ANSI subset — no DuckDB-dialect
functions) must produce, via ``spark.sql`` over registered table views,
exactly the rows the DataFrame implementation produces. This is the
contract that a SQL-speaking user of the catalog can run their queries
verbatim on this engine."""

from __future__ import annotations

import pandas as pd

from geospatial_data_lake_spark import load_all_queries
from geospatial_data_lake_spark.tables import TABLE_NAMES, tables
from tests.oracle import _normalize


def should_run_ansi_oracles_verbatim_on_spark_sql(spark, sf_dir):
    t = tables(spark, sf_dir)
    for name in TABLE_NAMES:
        getattr(t, name).createOrReplaceTempView(name)

    checked, skipped = [], []
    for name, spec in sorted(load_all_queries().items()):
        if spec.oracle is None:
            continue
        try:
            sql_df = spark.sql(spec.oracle)
            sql_df.schema  # force analysis
        except Exception:
            skipped.append(name)  # DuckDB-dialect oracle; DuckDB covers it
            continue
        got = _normalize(sql_df.toPandas())
        want = _normalize(spec.fn(spark, sf_dir).toPandas())
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False, obj=name,
        )
        checked.append(name)

    # the ANSI subset must stay substantial — a parser regression that
    # silently skips everything would otherwise pass vacuously
    assert len(checked) >= 40, (len(checked), skipped)
