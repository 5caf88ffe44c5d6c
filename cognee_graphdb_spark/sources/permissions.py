"""Users + dataset permissions (the reference's access-control surface,
SURVEY §3.1: ENABLE_BACKEND_ACCESS_CONTROL -> authorized_search resolves the
user's permitted datasets, then fans out per dataset).

Reference: cognee/modules/users/permissions/ (SQLAlchemy ACL tables,
give_permission_on_dataset / check_permission_on_dataset /
get_specific_user_permission_datasets) over a principal hierarchy
(models/Principal.py: a principal is a USER or a ROLE; users join roles via
UserRole, roles belong to tenants — models/Role.py); the permission types are
read/write/delete/share.  tests/test_permissions.py pins the deny-by-default
invariant; the cognify task list enforces write access up front
(check_permissions_on_dataset in api/v1/cognify/cognify.py:259-278).

Spark-first: one append-only grants table keyed by PRINCIPAL id (user or
role) + one role-membership table; authorization resolves the user's
principal set (user + their roles) and filters grants with an IN-filter that
composes with the engine's dataset_id partition pruning — the permission
check and the data pruning are the SAME predicate, so there is no
post-filter leakage path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PERMISSIONS = ("read", "write", "delete", "share")


class PermissionStore:
    def __init__(self, spark: SparkSession, root: str):
        from cognee_graphdb_spark.sources.fs import Fs

        self.spark = spark
        self.fs = Fs(spark, root)  # scheme-generic (S8): file://, s3a://, ...
        self.path = os.path.join(root, "permissions")
        self._roles_map: dict[str, list[str]] | None = None

    def _load(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.fs.exists(self.path) else None

    @property
    def _roles_path(self) -> str:
        return f"{self.path}_roles"

    def give_permission(self, user_id: str, dataset_id: str, permission: str = "read") -> None:
        """Grant to a PRINCIPAL — a user id or a role id
        (give_permission_on_dataset takes any Principal)."""
        if permission not in PERMISSIONS:
            raise ValueError(f"unknown permission {permission!r}; expected one of {PERMISSIONS}")
        self.spark.createDataFrame(
            [(user_id, dataset_id, permission)], ["user_id", "dataset_id", "permission"]
        ).write.mode("append").parquet(self.path)

    # -- roles (models/Role.py + UserRole membership) ------------------------

    def add_user_to_role(self, user_id: str, role_id: str, tenant_id: str | None = None) -> None:
        """Role membership: grants given to ``role_id`` flow to its users
        (the reference resolves a user's datasets through their roles,
        get_specific_user_permission_datasets).  ``tenant_id`` records the
        role's tenant (roles are unique per tenant, Role.py)."""
        self.spark.createDataFrame(
            [(user_id, role_id, tenant_id)],
            "user_id string, role_id string, tenant_id string",
        ).write.mode("append").parquet(self._roles_path)
        self._roles_map = None  # invalidate the membership cache

    def _role_map(self) -> dict[str, list[str]]:
        """user -> role ids, loaded ONCE per instance and invalidated by
        membership writes.  Every authorization check needs the principal
        set, and re-reading the (small) membership table per check would put
        a parquet scan + collect on the hot path of every search/add/
        cognify/delete call.  Per-instance caching mirrors the reference's
        per-session ACL resolution; another engine instance's membership
        writes appear on this instance's next construction."""
        if getattr(self, "_roles_map", None) is None:
            if not self.fs.exists(self._roles_path):
                self._roles_map = {}
            else:
                rows = (
                    self.spark.read.parquet(self._roles_path)
                    .select("user_id", "role_id")
                    .distinct()
                    .collect()
                )
                m: dict[str, set[str]] = {}
                for r in rows:
                    m.setdefault(r["user_id"], set()).add(r["role_id"])
                self._roles_map = {k: sorted(v) for k, v in m.items()}
        return self._roles_map

    def roles_of(self, user_id: str) -> list[str]:
        return self._role_map().get(user_id, [])

    def _principals(self, user_id: str) -> list[str]:
        """The user plus every role they belong to — the ACL principal set."""
        return [user_id, *self.roles_of(user_id)]

    def share_dataset(
        self, granter_id: str, grantee_id: str, dataset_id: str, permission: str = "read"
    ) -> None:
        """A ``share``-holder grants another principal access to the dataset
        (the reference's share flow: give_permission_on_dataset called by a
        principal that itself holds ``share``,
        cognee/modules/users/permissions/methods/).  Deny by default: a
        granter without ``share`` on the dataset cannot grant anything, and
        ``share`` itself can only be re-shared by a share-holder (standard
        delegation semantics)."""
        self.check_permission(granter_id, dataset_id, "share")
        self.give_permission(grantee_id, dataset_id, permission)

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
        self.fs.replace(tmp, self.path)

    def revoke_dataset(self, dataset_id: str) -> None:
        """Drop every grant on a dataset (dataset deletion): a future dataset
        reusing the name must start with an empty ACL, not inherit stale
        grants."""
        grants = self._load()
        if grants is None:
            return
        kept = grants.filter(~(F.col("dataset_id") == dataset_id))
        tmp = f"{self.path}.tmp"
        kept.write.mode("overwrite").parquet(tmp)
        self.fs.replace(tmp, self.path)

    def has_permission(self, user_id: str, dataset_id: str, permission: str = "read") -> bool:
        grants = self._load()
        if grants is None:
            return False
        return (
            grants.filter(
                F.col("user_id").isin(self._principals(user_id))
                & (F.col("dataset_id") == dataset_id)
                & (F.col("permission") == permission)
            ).first()
            is not None
        )

    def check_permission(self, user_id: str, dataset_id: str, permission: str) -> None:
        """Raise unless the user (directly or via a role) holds the
        permission — check_permission_on_dataset's contract, deny by
        default."""
        if not self.has_permission(user_id, dataset_id, permission):
            raise PermissionError(
                f"user {user_id!r} has no {permission!r} permission on dataset {dataset_id!r}"
            )

    def authorized_datasets(self, user_id: str, permission: str = "read") -> list[str]:
        """Deny by default: no grants table or no rows -> no datasets."""
        grants = self._load()
        if grants is None:
            return []
        rows = (
            grants.filter(
                F.col("user_id").isin(self._principals(user_id))
                & (F.col("permission") == permission)
            )
            .select("dataset_id")
            .distinct()
            .collect()
        )
        return sorted(r["dataset_id"] for r in rows)
