"""Structured Streaming ingestion parity.

The reference has no streaming surface (SURVEY §2.6) and the north rule
mandates batch, but the engine's event-aggregation shapes must also hold
under incremental execution: the SAME windowed aggregation run through
readStream (availableNow trigger, event-time watermark) must produce the
batch answer. This pins the operators to expressions that are legal in
both execution modes (no batch-only constructs in the shared path).
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _windowed(df):
    # cast NTZ → TIMESTAMP so the same plan is legal in streaming mode
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        df.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"
        )
    )


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="driver testdata absent"
)
def test_stream_windowed_agg_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = {
        (r.window_start, r.event_type): (r.cnt, r.total_value)
        for r in _windowed(batch).collect()
    }

    # stream source wants a directory of files: stage the events file alone
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    (src_dir / "part-0.parquet").write_bytes(
        open(f"{SF_DIR}/events.parquet", "rb").read()
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    # watermark bounds state; complete mode emits the full aggregate
    q = (
        _windowed(stream.withColumn("ts", F.col("ts").cast("timestamp"))
                  .withWatermark("ts", "1 day"))
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.cnt, r.total_value)
        for r in spark.sql("select * from win_agg").collect()
    }
    assert got == expected
    assert len(got) > 0
