"""Bucketed table layout for co-located joins (SURVEY.md §4 partitioning:
"bucketing for co-located joins").

Writing both sides of a recurring join bucketed (and sorted) by the join
key lets Spark plan the join WITHOUT any Exchange: matching bucket counts
mean bucket i of one table only ever meets bucket i of the other, so the
shuffle that would dominate a repeated fact-fact join at 100 TB is paid
once at write time and amortized over every subsequent join/aggregation
on that key (plan-asserted in tests/test_plan_quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table
    keyed for shuffle-free joins/aggregations on ``key``."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
