"""geospatial_data_lake_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``linz/geospatial-data-lake`` (see SURVEY.md), re-expressed as idiomatic
Spark: DataFrame/SQL over Parquet tables, driver-side orchestration instead
of Step Functions, pandas-UDF kernels only where built-in operators cannot
express the semantics.

Public entry points:

- :func:`geospatial_data_lake_spark.session.get_spark` — tuned local session
- :mod:`geospatial_data_lake_spark.registry` — the declared-query registry
  (each query paired with a DuckDB oracle SQL string for correctness)
- :mod:`geospatial_data_lake_spark.plans` — the re-architected ingest
  pipeline (catalog CRUD, STAC validation, checksums, import, status view)
"""

from geospatial_data_lake_spark.registry import REGISTRY, QuerySpec, load_all_queries

__all__ = ["REGISTRY", "QuerySpec", "load_all_queries"]
__version__ = "0.1.0"
