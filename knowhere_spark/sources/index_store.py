"""Index persistence — the reference's ``BinarySet`` serialize/deserialize
analog (include/knowhere/binaryset.h:23-111, index_node.h:371-401).

An index is a directory of Parquet tables plus a JSON manifest (the
"deserialize" of a mmap'd byte blob, flat.cc:338-356, becomes
``spark.read.parquet`` — lazy, disk-resident, partition-prunable, which is
exactly the DiskANN-style larger-than-RAM regime, SURVEY.md §2.3).

Layout::

    <path>/manifest.json          # index_type, metric, params, row count, dim
    <path>/<table>/...parquet     # per-index tables (centroids, assignments, …)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# Index-format version compatibility, mirroring knowhere::Version
# (include/knowhere/version.h:23-57): an index written at version v loads
# iff MINIMAL_INDEX_VERSION <= v <= CURRENT_INDEX_VERSION.  Bump CURRENT
# on layout changes; bump MINIMAL only when dropping read support.
MINIMAL_INDEX_VERSION = 0
# v2 (r8): SHARDED_HNSW switched from per-shard subdirectories to two
# __shard-partitioned tables (manifest "layout": "partitioned"); v0/v1
# indexes still load through the legacy branch in ShardedHNSWIndex.load
CURRENT_INDEX_VERSION = 2


class IndexVersionError(ValueError):
    """Manifest written by an unsupported index-format version."""


class IndexStore:
    def __init__(self, path: str):
        self.path = path

    def manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def write_manifest(self, manifest: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        manifest = {"index_version": CURRENT_INDEX_VERSION, **manifest}
        with open(self.manifest_path(), "w") as f:
            json.dump(manifest, f, indent=2, default=str)

    def read_manifest(self) -> dict:
        with open(self.manifest_path()) as f:
            m = json.load(f)
        # pre-versioning manifests read as the minimal (oldest-supported)
        # version — the same defaulting as Version::GetMinimalVersion
        v = int(m.get("index_version", MINIMAL_INDEX_VERSION))
        if not (MINIMAL_INDEX_VERSION <= v <= CURRENT_INDEX_VERSION):
            raise IndexVersionError(
                f"index at {self.path} has format version {v}; this build "
                f"supports [{MINIMAL_INDEX_VERSION}, {CURRENT_INDEX_VERSION}] "
                "(version.h:52 VerifyVersion semantics)"
            )
        return m

    def write_table(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(self.path, name))

    def read_table(
        self, spark: SparkSession, name: str, schema=None
    ) -> DataFrame:
        """``schema`` (a StructType or DDL/JSON-derived one) pins partition
        -column types: a partitioned layout stores those columns only in
        directory names, and inference would coerce e.g. a string label
        '01' to int 1 — silently merging distinct partitions."""
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(os.path.join(self.path, name))
