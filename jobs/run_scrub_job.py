#!/usr/bin/env python
"""Production entrypoint: the caption quality-filter + PII-scrub pipeline.

Cluster submission (the north-rule path):

    zip -r pipeline.zip pii_filter_spark
    spark-submit --py-files pipeline.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        jobs/run_scrub_job.py \
        --input  <catalog.table or parquet path> \
        --output <path> --num-parts 4096 --batch-parts 256

Local smoke (also what tests/test_checkpoint.py drives programmatically):

    python jobs/run_scrub_job.py --synthetic 2000 \
        --output /tmp/scrub_out --num-parts 16 --batch-parts 4

Resume semantics: re-running with the same --output continues from the
per-partition manifest — completed partitions are skipped, metrics stay
idempotent. --num-parts must match the original run (it is recorded in
the manifest and validated here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Local runs from the repo root; under spark-submit --py-files the package
# is on the path already and this is a no-op.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="input table path (input_hint schema)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic rows instead of reading --input")
    p.add_argument("--output", required=True)
    p.add_argument("--num-parts", type=int, default=256)
    p.add_argument("--batch-parts", type=int, default=32)
    p.add_argument("--snapshot-id", default="snap-0")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None,
                   help="override master (default: spark-submit's)")
    p.add_argument("--scrub-image-bytes", action="store_true",
                   help="also rewrite the binary column with PNG/JPEG "
                        "metadata stripped (lossless; pixels untouched)")
    args = p.parse_args(argv)
    if not args.input and not args.synthetic:
        p.error("one of --input / --synthetic is required")

    from pii_filter_spark.pipeline import run_pipeline
    from pii_filter_spark.session import get_spark
    from pii_filter_spark.sources import table_io
    from pii_filter_spark.sources.synth import write_input_table

    spark = get_spark(app_name="pii-filter-scrub", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    try:
        input_path = args.input
        if args.synthetic:
            input_path = f"{args.output.rstrip('/')}_synth_input"
            write_input_table(spark, input_path, args.synthetic, seed=args.seed)

        done_before = set(table_io.completed_part_ids(args.output))
        processed = run_pipeline(
            spark,
            input_path,
            args.output,
            num_parts=args.num_parts,
            batch_parts=args.batch_parts,
            snapshot_id=args.snapshot_id,
            scrub_image_bytes=args.scrub_image_bytes,
        )
        manifest = table_io.read_manifest(args.output)
        summary = {
            "partitions_total": args.num_parts,
            "partitions_resumed_from": len(done_before),
            "partitions_processed_this_run": len(processed),
            "rows_in": sum(m["rows_in"] for m in manifest),
            "rows_kept": sum(m["rows_kept"] for m in manifest),
            "rows_dropped": sum(m["rows_dropped"] for m in manifest),
            "scrub_count": sum(m["scrub_count"] for m in manifest),
            "output": args.output,
        }
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
