"""JDBC source/sink helpers (S1/S5/S6 rebuild).

Reference: datasource/SqlDataSource.scala:34-58 — every source is a
pushdown subquery ``(select ...) alias``; large tables use a partitioned
read whose upper bound comes from a driver-side scalar query
(DbManager.runIntQuery, utils/database/DbManager.scala:584-634).

Exercised end-to-end against embedded Derby (shipped in Spark's jars) in
tests/test_jdbc.py: overwrite/append sinks, the driver-side scalar
query, and the partitioned scan with driver-computed bounds; the
parquet-backed Tables in sources.testdata remains the fixture-facing
twin for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scalar_int_query(
    spark: SparkSession, url: str, sql: str, properties: dict | None = None
) -> int:
    """Driver-side scalar query (DbManager.runIntQuery rebuild).

    Subquery alias is a plain letter identifier — leading-underscore
    aliases are rejected by SQL-standard-strict engines (Derby).  The
    scalar expression in ``sql`` must itself be aliased (``count(*) AS
    c``): engines name unaliased aggregates arbitrarily (Derby: '1'),
    and Spark re-selects by that name on fetch.
    """
    row = (
        spark.read.jdbc(url, f"({sql}) sq", properties=properties or {})
        .collect()
    )
    return int(row[0][0]) if row else 0


def partitioned_jdbc_read(
    spark: SparkSession,
    url: str,
    subquery: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """SqlDataSource.loadData rebuild: pushdown subquery + partitioned
    scan with driver-computed bounds; unpartitioned + repartition
    otherwise (reference :34-58)."""
    table = f"({subquery}) src"
    props = properties or {}
    if partition_column:
        upper = scalar_int_query(
            spark,
            url,
            f"select max({partition_column}) as mx from ({subquery}) b",
            props,
        )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=0,
            upperBound=max(upper, 1),
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props).repartition(num_partitions)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", properties: dict | None = None
) -> None:
    """S5 — JDBC sink preserving Append/Overwrite semantics."""
    df.write.mode(mode).jdbc(url, table, properties=properties or {})
