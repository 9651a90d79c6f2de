"""Bucketed-table support: co-located joins with no exchange.

At 10^12 rows the dominant join cost is the shuffle. Spark's bucketing
(`bucketBy` + `saveAsTable`) persists both sides pre-hash-partitioned on
the join key, so a SortMergeJoin between tables bucketed on the same key
with the same bucket count needs NO Exchange on either side — the scan
itself satisfies the join's distribution requirement.
tests/test_bucketed.py asserts the Exchange-free plan.

The catalog here is Spark's session catalog over
spark.sql.warehouse.dir; on a production cluster the same calls target
the shared metastore / Iceberg catalog (Iceberg's bucket(N, col)
partition transform is the equivalent — see table_io seam).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: List[str],
    num_buckets: int = 16,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a parquet table bucketed (and optionally sorted)
    on the join key."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: List[str]
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a SortMergeJoin with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
