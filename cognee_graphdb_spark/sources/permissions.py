"""Users + dataset permissions (the reference's access-control surface,
SURVEY §3.1: ENABLE_BACKEND_ACCESS_CONTROL -> authorized_search resolves the
user's permitted datasets, then fans out per dataset).

Reference: cognee/modules/users/permissions/ (SQLAlchemy ACL tables,
give_permission_on_dataset / get_authorized_existing_datasets);
tests/test_permissions.py pins the deny-by-default invariant.

Spark-first: one append-only grants table; authorization is an IN-filter that
composes with the engine's dataset_id partition pruning — the permission check
and the data pruning are the SAME predicate, so there is no post-filter
leakage path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PERMISSIONS = ("read", "write", "delete", "share")


class PermissionStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "permissions")

    def _load(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if os.path.exists(self.path) else None

    def give_permission(self, user_id: str, dataset_id: str, permission: str = "read") -> None:
        if permission not in PERMISSIONS:
            raise ValueError(f"unknown permission {permission!r}; expected one of {PERMISSIONS}")
        self.spark.createDataFrame(
            [(user_id, dataset_id, permission)], ["user_id", "dataset_id", "permission"]
        ).write.mode("append").parquet(self.path)

    def revoke_permission(self, user_id: str, dataset_id: str, permission: str = "read") -> None:
        grants = self._load()
        if grants is None:
            return
        kept = grants.filter(
            ~(
                (F.col("user_id") == user_id)
                & (F.col("dataset_id") == dataset_id)
                & (F.col("permission") == permission)
            )
        )
        # append-only table rewritten in place via a temp path (small table)
        tmp = f"{self.path}.tmp"
        kept.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def has_permission(self, user_id: str, dataset_id: str, permission: str = "read") -> bool:
        grants = self._load()
        if grants is None:
            return False
        return (
            grants.filter(
                (F.col("user_id") == user_id)
                & (F.col("dataset_id") == dataset_id)
                & (F.col("permission") == permission)
            ).first()
            is not None
        )

    def authorized_datasets(self, user_id: str, permission: str = "read") -> list[str]:
        """Deny by default: no grants table or no rows -> no datasets."""
        grants = self._load()
        if grants is None:
            return []
        rows = (
            grants.filter((F.col("user_id") == user_id) & (F.col("permission") == permission))
            .select("dataset_id")
            .distinct()
            .collect()
        )
        return sorted(r["dataset_id"] for r in rows)
