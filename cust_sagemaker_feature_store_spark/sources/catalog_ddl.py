"""Catalog DDL surface (SURVEY.md §2.1 S9).

The reference manages its offline catalog with Athena DDL — CREATE
DATABASE / CREATE EXTERNAL TABLE / SHOW TABLES / DROP (reference:
setup.sh:116-143, cleanup.sh:43-60). Spark's catalog covers all of it
natively; these helpers pin the exact statements the engine uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_external_table(
    spark: SparkSession, database: str, table: str, location: str
) -> None:
    """External parquet table over an offline-store location — the
    Spark twin of the reference's Athena DDL (reference: setup.sh:132-143).
    Schema comes from the parquet footers; USING parquet keeps the scan
    vectorized + pushdown-capable."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{table} "
        f"USING parquet LOCATION '{location}'"
    )


def show_tables(spark: SparkSession, database: str) -> list[str]:
    return [t.name for t in spark.catalog.listTables(database)]


def drop_table(spark: SparkSession, database: str, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {database}.{table}")


def drop_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {name}{' CASCADE' if cascade else ''}")


def register_temp_view(df: DataFrame, name: str) -> None:
    df.createOrReplaceTempView(name)
