"""Z-order layout: the written files must carry *tight* per-column
min/max ranges on BOTH keyed columns — that's the statistic parquet
row-group skipping prunes by. An unordered write leaves every file
spanning ~the full domain (no skipping possible); the Morton layout must
cut the average span on each dimension."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from geospatial_data_lake_spark.layout import write_zordered


def _avg_file_span(path_glob: str, col: str, domain: float) -> float:
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        schema_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        i = schema_idx[col]
        lo = min(meta.row_group(g).column(i).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(i).statistics.max for g in range(meta.num_row_groups))
        spans.append((hi - lo) / domain)
    return sum(spans) / len(spans)


def should_tighten_minmax_ranges_on_both_columns(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 1000).cast("double").alias("x"),
        ((F.col("id") * 104729) % 1000).cast("double").alias("y"),
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.mode("overwrite").parquet(plain)
    write_zordered(df, zord, ["x", "y"], n_files=16)

    # same rows back
    assert spark.read.parquet(zord).count() == n
    assert (
        spark.read.parquet(zord).agg(F.sum("x"), F.sum("y")).collect()
        == df.agg(F.sum("x"), F.sum("y")).collect()
    )

    for col in ("x", "y"):
        span_plain = _avg_file_span(f"{plain}/part-*.parquet", col, 1000.0)
        span_zord = _avg_file_span(f"{zord}/part-*.parquet", col, 1000.0)
        # hash-partitioned files span ~the whole domain; z-ordered files
        # must cover materially less of it on every keyed dimension
        assert span_plain > 0.9, f"{col}: plain span {span_plain}"
        assert span_zord < 0.6 * span_plain, (
            f"{col}: zorder span {span_zord} vs plain {span_plain}"
        )


def should_join_bucketed_tables_without_exchange(spark, tmp_path):
    import contextlib
    import io
    import re

    from geospatial_data_lake_spark.layout import write_bucketed

    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 89).alias("v2")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8, sort_cols=["k"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
            assert joined.count() == 5_000
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
            assert n_exchanges == 0, (
                "bucketed join must be exchange-free:\n" + plan
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
