"""Fused quality + scrub stage: ONE Arrow round-trip per caption batch.

quality_stage + scrub_stage are kept as composable operators, but chaining
them creates two ArrowEvalPython stages — two Python workers per task and
two Arrow (de)serializations of the caption column. And the native
higher-order-function rule expressions (filter/transform lambdas) are
interpreted JVM-side; measured at 32 local cores they add ~40% wall time
from allocation contention, while the pure-Python rule evaluator does the
same rows at ~60k rows/s/core. On a 10^12-row table the scalable shape is:
JVM does scan + write, Python (which parallelizes linearly across workers)
does all per-row logic in one vectorized batch stage.

`fused_quality_scrub` therefore computes lang, ppl, drop_reasons, keep,
scrubbed_caption and pii_masked in a single pandas UDF built on the frozen
core semantics (core/quality.py, core/detect.py). Output columns and
values are identical to scrub_stage(quality_stage(df)) — asserted by
tests/test_spark_stages.py::test_fused_stage_equals_chained_stages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..core.detect import scrub_batch
from ..core.langid import detect_language
from ..core.perplexity import perplexity
from ..core.quality import drop_reasons
from .scrub import MAPPING_TYPE

_FUSED_TYPE = StructType(
    [
        StructField("lang", StringType()),
        StructField("ppl", DoubleType()),
        StructField("drop_reasons", ArrayType(StringType())),
        StructField("keep", BooleanType()),
        StructField("scrubbed_caption", StringType()),
        StructField("pii_masked", ArrayType(MAPPING_TYPE)),
    ]
)


@pandas_udf(_FUSED_TYPE)
def fused_udf(captions: pd.Series) -> pd.DataFrame:
    langs, ppls, reasons = [], [], []
    for t in captions:
        if isinstance(t, str):
            lg, pp = detect_language(t), perplexity(t)
        else:
            lg, pp = "und", 0.0
        langs.append(lg)
        ppls.append(pp)
        reasons.append(drop_reasons(t if isinstance(t, str) else None, lg, pp))
    scrubbed = scrub_batch(captions)
    return pd.DataFrame(
        {
            "lang": langs,
            "ppl": ppls,
            "drop_reasons": reasons,
            "keep": [len(r) == 0 for r in reasons],
            "scrubbed_caption": [r[0] for r in scrubbed],
            "pii_masked": [r[1] for r in scrubbed],
        }
    )


def fused_quality_scrub(df: DataFrame, caption_col: str = "caption") -> DataFrame:
    """Equivalent of scrub_stage(quality_stage(df)) in one Python stage."""
    out = df.withColumn("_fx", fused_udf(F.col(caption_col)))
    return (
        out.withColumn("lang", F.col("_fx.lang"))
        .withColumn("ppl", F.col("_fx.ppl"))
        .withColumn("drop_reasons", F.col("_fx.drop_reasons"))
        .withColumn("keep", F.col("_fx.keep"))
        .withColumn("scrubbed_caption", F.col("_fx.scrubbed_caption"))
        .withColumn("pii_masked", F.col("_fx.pii_masked"))
        .withColumn("scrub_count", F.size("pii_masked"))
        .drop("_fx")
    )
