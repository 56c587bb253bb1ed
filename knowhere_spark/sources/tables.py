"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; available: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def embeddings_as_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table in the engine's canonical (id, vec) shape
    (SURVEY.md §1.1: base table = ``id BIGINT, vec ARRAY<FLOAT>``)."""
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").alias("vec"),
        F.col("label"),
    )
