"""KMV distinct-count sketch: accuracy, exact-below-k, determinism."""

import pytest
from pyspark.sql import functions as F


def test_kmv_exact_below_k(spark):
    from pii_filter_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 10) for i in range(200)], "k string, v long"
    )
    (row,) = kmv_distinct(df, "k", "v", k=64).collect()
    # 10 distinct values < k  ->  exact count, zero error
    assert row.n_hashes == 10
    assert row.kmv_estimate == 10.0


def test_kmv_estimator_accuracy(spark):
    from pii_filter_spark.operators.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame(
        [("a", i) for i in range(n)] * 2, "k string, v long"
    )
    (row,) = kmv_distinct(df, "k", "v", k=256).collect()
    assert row.n_hashes == 256
    # relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row.kmv_estimate - n) / n < 0.25, row.kmv_estimate


def test_kmv_deterministic_across_layouts(spark):
    from pii_filter_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i * 7) for i in range(900)], "k string, v long"
    )
    a = {tuple(r) for r in kmv_distinct(df, "k", "v").collect()}
    b = {tuple(r) for r in kmv_distinct(df.repartition(13), "k", "v").collect()}
    assert a == b
