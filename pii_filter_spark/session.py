"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pii_filter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a session with AQE + Arrow tuned for a binary-heavy table.

    On a real cluster these land in spark-submit --conf; the defaults below
    are the ones the pipeline depends on:
      * AQE on (coalesce + skew-join split) — north rule "AQE-tuned shuffles";
      * Arrow pandas-UDF transfer on, with a small maxRecordsPerBatch because
        rows carry an image `bytes` column (MB-scale rows would otherwise
        produce multi-GB Arrow batches at 10^12-image scale);
      * shuffle partition count sized to the test machine; a cluster run
        should set it to ~2-3x total executor cores.
    """
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cores))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Input-split sizing. Two opposing costs: a pandas-UDF task pays
        # ~200 ms of per-task worker-protocol overhead (measured; it does
        # not amortize across tasks), so tasks must be big enough that
        # Python compute dominates; but splits fewer than the core count
        # leave cores idle (the 4 MB default openCost makes many-small-file
        # tables collapse to ~#cores/2 splits). 128 MB max + 1 MB openCost
        # + minPartitionNum = parallelism keeps split count ≈ max(cores,
        # bytes/128MB) at every cluster size — the same rule that holds on
        # a 1000-executor scan of 100 TB.
        # Work around a Spark 4.1 optimizer defect: Union.rewriteConstraints
        # dies with "NoSuchElementException: key not found: <attr>" when a
        # union-sourced plan feeds two sibling branches (the LSH hybrid
        # native/vectorized split) — constraint inference only ADDS derived
        # filters, so disabling it never changes results, only plans.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
