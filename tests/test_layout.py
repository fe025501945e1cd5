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
