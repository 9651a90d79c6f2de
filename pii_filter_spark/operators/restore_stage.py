"""Restoration stage: inverse of the scrub transform (reference R1–R3).

Mirrors /root/reference/src/services/restoration_service.py:43-165 as a
vectorized column transform: placeholder→original substitution in reverse
span order (R1), duplicate-label cleanup (R2), and the residual-placeholder
integrity flag (R3, reference :76-91) — all per-row, so one pandas UDF over
(scrubbed, mappings) with no shuffle.

Round-trip contract (tests/test_pipeline.py): for every row,
restore(scrub(caption)) == caption and restore_ok is true.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from ..core.restore import cleanup_duplicate_labels, has_residual_placeholders, restore_text

_RESTORE_TYPE = StructType(
    [
        StructField("restored_caption", StringType()),
        StructField("restore_ok", BooleanType()),
    ]
)


@pandas_udf(_RESTORE_TYPE)
def restore_udf(scrubbed: pd.Series, mappings: pd.Series) -> pd.DataFrame:
    texts, oks = [], []
    for s, maps in zip(scrubbed, mappings):
        mlist = [dict(m) for m in maps] if maps is not None else []
        t = restore_text(s if isinstance(s, str) else "", mlist)
        texts.append(t)
        oks.append(not has_residual_placeholders(t))
    return pd.DataFrame({"restored_caption": texts, "restore_ok": oks})


def restore_stage(
    df: DataFrame,
    scrubbed_col: str = "scrubbed_caption",
    mappings_col: str = "pii_masked",
    cleanup_labels: bool = False,
) -> DataFrame:
    """Adds restored_caption + restore_ok.

    cleanup_labels applies the reference's duplicate-label regex pass
    (R2); off by default because it is NOT identity-safe on text that
    legitimately repeats a label word, so round-trip tests skip it.
    """
    out = df.withColumn("_r", restore_udf(F.col(scrubbed_col), F.col(mappings_col)))
    out = (
        out.withColumn("restored_caption", F.col("_r.restored_caption"))
        .withColumn("restore_ok", F.col("_r.restore_ok"))
        .drop("_r")
    )
    if cleanup_labels:
        cleanup = pandas_udf(
            lambda s: s.map(
                lambda t: cleanup_duplicate_labels(t) if isinstance(t, str) else t
            ),
            StringType(),
        )
        out = out.withColumn("restored_caption", cleanup(F.col("restored_caption")))
    return out
