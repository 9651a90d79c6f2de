"""Full caption quality-filter + PII-scrub pipeline with checkpoint/resume.

Composition (cheap-first stage ordering — the reference's own optimization
principle, README.md:1264/1745-1752, applied to column transforms):
    read → quality stage (native exprs + langid/ppl UDF)
         → scrub stage   (fused PII/toxicity pandas UDF)
         → write partitioned by part_id, manifest entry per partition

Checkpoint/resume [north rule]: rows hash deterministically into
`num_parts` logical partitions (pmod(xxhash64(image_id), P)); partitions
are processed in batches, each batch lands via dynamic partition overwrite
(idempotent re-runs), and a manifest entry per completed partition is the
commit record. A restart anti-joins the partition list against the
manifest and reprocesses only missing partitions — identical final table,
idempotent metrics (tests/test_checkpoint.py kills a run mid-way and
asserts equality).

Scale notes: the whole hot path is one scan → two UDF projections → one
partitioned write; no joins or aggregations touch the MB-scale `bytes`
column. Metrics aggregate from the written output (also validating the
persisted data). `batch_parts` bounds the blast radius of a failure; at
10^12 rows you'd size num_parts so one partition ≈ one Iceberg file group.
"""

from __future__ import annotations

import time
from typing import List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.metrics import partition_metrics
from .sources import table_io

PART_COL = "part_id"


def with_part_id(df: DataFrame, num_parts: int, id_col: str = "image_id") -> DataFrame:
    return df.withColumn(PART_COL, F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_parts)))


def transform(df: DataFrame) -> DataFrame:
    """The logical plan; bytes passes through untouched.

    Uses the fused single-Arrow-round-trip stage — semantically identical
    to scrub_stage(quality_stage(df)) (see operators/fused.py) but one
    Python stage instead of two, halving worker-process pressure.
    """
    from .operators.fused import fused_quality_scrub

    return fused_quality_scrub(df)


def scrub_bytes_stage(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Optional image-bytes PII writeback stage (default OFF — the
    flagship keeps bytes out of Python entirely): rewrites the binary
    column with metadata stripped — PNG ancillary chunks
    (images/metadata.strip_ancillary) or JPEG APP1/APP13/COM segments
    (images/jpeg_metadata.strip_jpeg_metadata). Both strips are
    marker/chunk-level rewrites, so decoded pixels are bit-identical by
    construction; unknown formats pass through untouched. One Arrow
    pandas UDF — bytes cross into Python once and never shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _clean(s: pd.Series) -> pd.Series:
        from .images.jpeg_metadata import strip_jpeg_metadata
        from .images.metadata import is_png, strip_ancillary

        def one(x):
            if x is None:
                return None
            b = bytes(x)
            return strip_ancillary(b) if is_png(b) else strip_jpeg_metadata(b)

        return pd.Series([one(x) for x in s])

    return df.withColumn(bytes_col, _clean(F.col(bytes_col)))


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    num_parts: int = 32,
    batch_parts: int = 8,
    fail_after_batch: Optional[int] = None,
    snapshot_id: str = "snap-0",
    scrub_image_bytes: bool = False,
) -> List[int]:
    """Run (or resume) the pipeline. Returns the part_ids processed this run.

    fail_after_batch is a test hook: raise after N committed batches to
    simulate a mid-run kill. scrub_image_bytes additionally rewrites the
    binary column with PNG/JPEG metadata stripped (see scrub_bytes_stage).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    src = with_part_id(table_io.read_table(spark, input_path), num_parts)
    if scrub_image_bytes:
        src = scrub_bytes_stage(src)

    done = set(table_io.completed_part_ids(output_path))
    todo = [p for p in range(num_parts) if p not in done]
    processed: List[int] = []

    for batch_idx in range(0, len(todo), batch_parts):
        batch = todo[batch_idx : batch_idx + batch_parts]
        t0 = time.perf_counter()
        out = transform(src.where(F.col(PART_COL).isin(batch)))
        # dynamic overwrite: exactly these part_id directories are replaced
        out.write.mode("overwrite").partitionBy(PART_COL).parquet(output_path)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        # metrics from the PERSISTED batch (read-back validates the write)
        written = table_io.read_table(spark, output_path).where(
            F.col(PART_COL).isin(batch)
        )
        mrows = {r[PART_COL]: r.asDict() for r in partition_metrics(written).collect()}
        for p in batch:
            m = mrows.get(
                p,
                {"rows_in": 0, "rows_kept": 0, "rows_dropped": 0, "scrub_count": 0,
                 "drop_reason_counts": None},
            )
            table_io.write_manifest_entry(
                output_path,
                p,
                {
                    "snapshot_id": snapshot_id,
                    "rows_in": int(m["rows_in"] or 0),
                    "rows_kept": int(m["rows_kept"] or 0),
                    "rows_dropped": int(m["rows_dropped"] or 0),
                    "scrub_count": int(m["scrub_count"] or 0),
                    "drop_reason_counts": dict(m["drop_reason_counts"] or {}),
                    "wall_ms": wall_ms,
                },
            )
        processed.extend(batch)
        batches_done = batch_idx // batch_parts + 1
        if fail_after_batch is not None and batches_done >= fail_after_batch:
            raise RuntimeError(f"injected failure after batch {batches_done}")
    return processed
