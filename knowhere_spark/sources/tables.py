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
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark rejects
        # (PARQUET_TYPE_ILLEGAL).  Read nanos as long, then truncate to
        # microsecond timestamps — same precision loss DuckDB applies when
        # casting TIMESTAMP_NS to TIMESTAMP, so oracles stay comparable.
        from pyspark.sql import functions as F

        # scope the legacy conf to this read: leaving it set session-wide
        # would silently turn ANY later TIMESTAMP(NANOS) parquet read in
        # the same session into bigint columns
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            # force schema resolution while the conf is active; the
            # DataFrame's schema is then fixed for its lifetime
            df.schema
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/`: epoch nanos exceed double's 53-bit
            # exact-integer range, so float division can be off by ~1 us
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def embeddings_as_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table in the engine's canonical (id, vec) shape
    (SURVEY.md §1.1: base table = ``id BIGINT, vec ARRAY<FLOAT>``)."""
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").alias("vec"),
        F.col("label"),
    )
