"""PII + toxicity scrub stage (the flagship operator).

One Arrow-batched pandas UDF fuses what the reference runs as three
text-mutating passes (regex → NER → LLM-slot; /root/reference/src/api/
proxy.py:115-146): detection on raw offsets, precedence resolution, and a
single substitution (semantics frozen in core/detect.py). Fusing matters
physically — each pandas-UDF stage is an Arrow round-trip through the
Python worker, so three stages would triple serialization cost on a
10^12-row table; one stage pays it once and only ships the `caption`
column (Catalyst prunes the MB-scale `bytes` column away from this UDF's
projection automatically).

Pattern/dictionary state compiles once per Python worker at module import
(--py-files), the moral equivalent of a broadcast variable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..core.detect import scrub_batch

MAPPING_TYPE = StructType(
    [
        StructField("placeholder", StringType()),
        StructField("original_value", StringType()),
        StructField("type", StringType()),
        StructField("span_start", IntegerType()),
        StructField("span_end", IntegerType()),
    ]
)

# array<struct> of mappings + scrubbed text, returned as one struct column.
SCRUB_RESULT_TYPE = StructType(
    [
        StructField("scrubbed_caption", StringType()),
        StructField("pii_masked", ArrayType(MAPPING_TYPE)),
    ]
)


@pandas_udf(SCRUB_RESULT_TYPE)
def scrub_udf(captions: pd.Series) -> pd.DataFrame:
    results = scrub_batch(captions)
    return pd.DataFrame(
        {
            "scrubbed_caption": [r[0] for r in results],
            "pii_masked": [r[1] for r in results],
        }
    )


def scrub_stage(df: DataFrame, caption_col: str = "caption") -> DataFrame:
    """Adds scrubbed_caption, pii_masked, scrub_count columns."""
    out = df.withColumn("_scrub", scrub_udf(F.col(caption_col)))
    return (
        out.withColumn("scrubbed_caption", F.col("_scrub.scrubbed_caption"))
        .withColumn("pii_masked", F.col("_scrub.pii_masked"))
        .withColumn("scrub_count", F.size("pii_masked"))
        .drop("_scrub")
    )
