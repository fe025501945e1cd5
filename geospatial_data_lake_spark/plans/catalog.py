"""Dataset catalog CRUD — SURVEY.md §3.2.

The reference's catalog is DynamoDB items behind Lambda handlers
(`backend/datasets/entrypoint.py:15-24`); here it is a parquet table with
the same request semantics:

- create: title-regex validation (`backend/datasets/create.py:11-29`),
  title-uniqueness precondition (`create.py:33`), mint id, insert.
- get by id (point read, `get.py:42-44`), by title (`get.py:73`),
  list (`list.py:14-16`).
- update: title uniqueness re-checked (`update.py:30`).
- delete: guarded by the no-versions anti-join (`delete.py:38-45`).

Storage: plain parquet with atomic directory swap (write new snapshot,
rename). On a production lake this module is the one place that would swap
to Delta ``MERGE INTO`` for serializable upserts — the call sites keep the
same shape. Catalog tables are small (metadata, not data), so snapshot
rewrite is O(catalog), never O(data).
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geospatial_data_lake_spark import schemas

TITLE_PATTERN = re.compile(r"^[A-Za-z0-9_-]+$")  # ref: backend/datasets/create.py:11-12


class ConflictError(Exception):
    pass


class NotFoundError(Exception):
    pass


class ValidationError(Exception):
    pass


class DatasetCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._datasets_path = os.path.join(root, "datasets")
        self._versions_path = os.path.join(root, "dataset_versions")

    # -- storage helpers ---------------------------------------------------
    def _read(self, path: str, schema) -> DataFrame:
        if os.path.exists(path):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def datasets(self) -> DataFrame:
        return self._read(self._datasets_path, schemas.DATASETS)

    def versions(self) -> DataFrame:
        return self._read(self._versions_path, schemas.DATASET_VERSIONS)

    def _overwrite(self, df: DataFrame, path: str) -> None:
        """Atomic snapshot swap (Delta MERGE stand-in)."""
        tmp = f"{path}.__tmp__"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = f"{path}.__old__"
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    # -- CRUD --------------------------------------------------------------
    def create_dataset(self, title: str) -> dict:
        """ref: backend/datasets/create.py:18-39 (validate -> uniqueness ->
        put -> consistent re-read)."""
        if not TITLE_PATTERN.match(title or ""):
            raise ValidationError(f"title does not match {TITLE_PATTERN.pattern!r}")
        existing = self.datasets()
        # uniqueness probe = semi-join-shaped filter + limit-1 (A3/O2)
        if not existing.filter(F.col("title") == title).isEmpty():
            raise ConflictError(f"dataset with title {title!r} already exists")
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        dataset_id = uuid.uuid4().hex
        row = self.spark.createDataFrame(
            [(dataset_id, title, now, now)], schemas.DATASETS
        )
        self._overwrite(existing.unionByName(row), self._datasets_path)
        return self.get_dataset(dataset_id=dataset_id)

    def get_dataset(
        self, dataset_id: str | None = None, title: str | None = None
    ) -> dict:
        """ref: backend/datasets/get.py:42-81 (point get / GSI title query)."""
        df = self.datasets()
        if dataset_id is not None:
            df = df.filter(F.col("dataset_id") == dataset_id)
        elif title is not None:
            df = df.filter(F.col("title") == title)
        else:
            raise ValidationError("must provide dataset_id or title")
        rows = df.limit(1).collect()
        if not rows:
            raise NotFoundError(f"dataset not found: {dataset_id or title}")
        return rows[0].asDict()

    def list_datasets(self) -> DataFrame:
        """ref: backend/datasets/list.py:14-16."""
        return self.datasets().orderBy("title")

    def update_dataset(self, dataset_id: str, title: str) -> dict:
        """ref: backend/datasets/update.py (title re-validated + unique)."""
        if not TITLE_PATTERN.match(title or ""):
            raise ValidationError(f"title does not match {TITLE_PATTERN.pattern!r}")
        existing = self.datasets()
        if existing.filter(F.col("dataset_id") == dataset_id).isEmpty():
            raise NotFoundError(f"dataset not found: {dataset_id}")
        if not existing.filter(
            (F.col("title") == title) & (F.col("dataset_id") != dataset_id)
        ).isEmpty():
            raise ConflictError(f"dataset with title {title!r} already exists")
        updated = existing.withColumn(
            "title",
            F.when(F.col("dataset_id") == dataset_id, F.lit(title)).otherwise(
                F.col("title")
            ),
        ).withColumn(
            "updated_at",
            F.when(
                F.col("dataset_id") == dataset_id,
                F.lit(datetime.now(timezone.utc).replace(tzinfo=None)),
            ).otherwise(F.col("updated_at")),
        )
        self._overwrite(updated, self._datasets_path)
        return self.get_dataset(dataset_id=dataset_id)

    def delete_dataset(self, dataset_id: str) -> None:
        """ref: backend/datasets/delete.py:38-45 — delete only when no
        versions exist (anti-join guard, J5)."""
        existing = self.datasets()
        if existing.filter(F.col("dataset_id") == dataset_id).isEmpty():
            raise NotFoundError(f"dataset not found: {dataset_id}")
        has_versions = not (
            self.versions().filter(F.col("dataset_id") == dataset_id).isEmpty()
        )
        if has_versions:
            raise ConflictError(f"dataset {dataset_id} still has versions")
        self._overwrite(
            existing.filter(F.col("dataset_id") != dataset_id), self._datasets_path
        )

    def register_version(
        self, dataset_id: str, version_id: str, metadata_url: str, status: str
    ) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        row = self.spark.createDataFrame(
            [(dataset_id, version_id, now, metadata_url, status)],
            schemas.DATASET_VERSIONS,
        )
        self._overwrite(self.versions().unionByName(row), self._versions_path)


def mint_version_id(now: datetime | None = None, entropy: str | None = None) -> str:
    """Sortable, human-readable version id (ref ULID formatting,
    backend/datasets_model.py:13-23): timestamp prefix keeps ids
    lexicographically time-ordered."""
    now = now or datetime.now(timezone.utc)
    entropy = entropy or uuid.uuid4().hex[:16]
    return f"{now.strftime('%Y-%m-%dT%H-%M-%S-%f')[:-3]}Z_{entropy}"
