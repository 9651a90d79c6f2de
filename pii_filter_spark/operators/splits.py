"""Deterministic train/validation/test split assignment.

Every training-data pipeline ends by carving held-out sets, and at
10^12 rows the only sane mechanism is a HASH split: `rand()` changes
under re-execution, resharding, and retries, silently leaking eval rows
into training between runs. The standard recipe (used by C4's
validation split and most internal corpus pipelines) is a stable
bucket hash of the row id — membership is a pure function of the id,
reproducible on any engine, any partitioning, any day.

Implementation: the repo's portable md5-prefix bucket (same recipe as
the KMV sketch / shard hash — first 7 hex chars as an integer, mod
`denom`), compared against cumulative literal thresholds in one codegen
CASE. Zero shuffles, zero Python; at any scale this fuses into the
scan. The DuckDB oracle is plain SQL over the identical expression.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLITS: List[Tuple[str, int]] = [
    ("train", 9800),   # cumulative thresholds out of denom
    ("val", 9900),
    ("test", 10000),
]


def split_bucket(id_col: Column, denom: int = 10000) -> Column:
    """Portable md5-prefix bucket in [0, denom)."""
    h = F.md5(id_col.cast("string"))
    return F.pmod(
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long"), F.lit(denom)
    )


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: List[Tuple[str, int]] = None,
    denom: int = 10000,
) -> DataFrame:
    """Adds (split_bucket, split): hash-stable split membership.

    `splits` is a list of (name, cumulative_threshold) ending at
    `denom`; a row belongs to the first split whose threshold exceeds
    its bucket. Membership never changes across runs/partitionings.
    """
    splits = splits or DEFAULT_SPLITS
    if splits[-1][1] != denom:
        raise ValueError("last split threshold must equal denom")
    if any(b[1] <= a[1] for a, b in zip(splits, splits[1:])):
        raise ValueError("split thresholds must be strictly increasing")
    b = split_bucket(F.col(id_col), denom)
    expr = None
    for name, cum in splits[:-1]:
        cond = b < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(splits[-1][0]) if expr is None
        else expr.otherwise(F.lit(splits[-1][0]))
    )
    return df.withColumns({"split_bucket": b, "split": expr})
