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


def read_table(
    spark: SparkSession, path: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Read a table (parquet directory or file).

    If the table has a snapshot log (written via snapshot_write), reads
    resolve through it: the CURRENT snapshot's file list by default, or
    any retained historical snapshot via `snapshot_id` — the Iceberg
    time-travel surface (`VERSION AS OF`) on the parquet fallback. Plain
    directories without a snapshot log read directly.
    """
    if snapshot_id is not None or os.path.isdir(snapshots_dir(path)):
        snaps = {s["snapshot_id"]: s for s in list_snapshots(path)}
        if snapshot_id is None:
            snapshot_id = current_snapshot_id(path)
        if snapshot_id not in snaps:
            raise ValueError(
                f"snapshot {snapshot_id} not found in {path} "
                f"(have {sorted(snaps)})"
            )
        files = [os.path.join(path, f) for f in snaps[snapshot_id]["files"]]
        return spark.read.parquet(*files)
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


# --- snapshot log (Iceberg-style time travel on the parquet fallback) -------
#
# Mirrors the three Iceberg metadata behaviours the north rule's lineage
# story needs, without the runtime jars:
#   * every write is a new immutable SNAPSHOT (monotonic id, parent link,
#     operation, explicit data-file list);
#   * old snapshots retain their files — an overwrite supersedes the
#     current pointer but snapshot N-1 stays readable (time travel);
#   * commits are atomic: the vN.json and the `current` pointer land via
#     write-temp + os.replace, so a killed writer never publishes a
#     partial snapshot. (Real Iceberg does CAS on the pointer; the
#     single-writer fallback is last-write-wins, documented.)

def snapshots_dir(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots")


def list_snapshots(table_path: str) -> List[Dict]:
    d = snapshots_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(d, name), encoding="utf-8") as fh:
                out.append(json.load(fh))
    return out


def current_snapshot_id(table_path: str) -> Optional[int]:
    ptr = os.path.join(snapshots_dir(table_path), "current")
    if not os.path.isfile(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return int(fh.read().strip())


def _publish(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(content)
    os.replace(tmp, path)


def snapshot_write(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    partition_by: Optional[List[str]] = None,
) -> int:
    """Write `df` as a new snapshot of the table; returns its id.

    mode="append": the new snapshot's file list is the parent's plus the
    new files. mode="overwrite": the new list is just the new files —
    but the parent's files stay on disk and its snapshot stays readable.
    Data files land under data/s{id:05d}/ so concurrent historical reads
    never race with new writes.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_write mode must be append|overwrite, got {mode}")
    snaps = list_snapshots(table_path)
    parent = current_snapshot_id(table_path)
    new_id = (max((s["snapshot_id"] for s in snaps), default=0)) + 1
    rel_dir = os.path.join("data", f"s{new_id:05d}")
    out_dir = os.path.join(table_path, rel_dir)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)
    inherited: List[str] = []
    if mode == "append" and parent is not None:
        by_id = {s["snapshot_id"]: s for s in snaps}
        inherited = list(by_id[parent]["files"])
    snap = {
        "snapshot_id": new_id,
        "parent_id": parent,
        "operation": mode,
        "files": inherited + [rel_dir],
        "added_files": [rel_dir],
    }
    d = snapshots_dir(table_path)
    os.makedirs(d, exist_ok=True)
    _publish(
        os.path.join(d, f"v{new_id:05d}.json"),
        json.dumps(snap, sort_keys=True),
    )
    _publish(os.path.join(d, "current"), str(new_id))
    return new_id


def expire_snapshots(table_path: str, keep_last: int = 2) -> Dict:
    """Iceberg `expireSnapshots` + orphan-file cleanup for the snapshot
    log: retain the newest `keep_last` snapshots (always including the
    current one), delete the older snapshot JSONs, then delete any data
    directory no RETAINED snapshot references.

    Expiry order is the metadata order (snapshot id), data deletion is
    reference-counted against the retained set only — so a data dir
    inherited by a newer append snapshot survives even when the snapshot
    that added it expires, exactly Iceberg's semantics. Time travel to
    an expired snapshot raises thereafter (by design).

    Returns {"expired": [ids], "retained": [ids], "removed_dirs": [...]}.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = sorted(list_snapshots(table_path), key=lambda s: s["snapshot_id"])
    cur = current_snapshot_id(table_path)
    keep_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
    if cur is not None:
        keep_ids.add(cur)
    retained = [s for s in snaps if s["snapshot_id"] in keep_ids]
    expired = [s for s in snaps if s["snapshot_id"] not in keep_ids]

    for s in expired:
        os.remove(
            os.path.join(snapshots_dir(table_path), f"v{s['snapshot_id']:05d}.json")
        )

    referenced = {f for s in retained for f in s["files"]}
    removed = []
    data_root = os.path.join(table_path, "data")
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join("data", name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
    return {
        "expired": [s["snapshot_id"] for s in expired],
        "retained": [s["snapshot_id"] for s in retained],
        "removed_dirs": removed,
    }


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


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_col: str,
) -> int:
    """Copy-on-write MERGE into the snapshot table (the Iceberg CoW
    shape): the new snapshot is updates ∪ (current rows whose key has no
    update) — an UPDATE for existing keys, an INSERT for new ones,
    atomically published as one snapshot; the parent snapshot stays
    readable (time travel covers pre-merge state).

    Scale shape: the anti-join's build side is the update KEY SET
    (broadcast when small — the overwhelmingly common incremental-crawl
    case). A real Iceberg CoW run rewrites only the FILES whose key
    ranges intersect the updates via file-level stats pruning; this
    parquet-fallback seam rewrites the table because the fallback keeps
    no per-file stats index — the join shape is the part that carries
    to the real table format. Returns the new snapshot id."""
    current = read_table(spark, table_path)
    keys = updates.select(key_col).distinct()
    kept = current.join(keys, key_col, "left_anti")
    merged = kept.unionByName(updates)
    return snapshot_write(merged, table_path, mode="overwrite")
