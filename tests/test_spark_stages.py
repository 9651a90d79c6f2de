"""Spark stage ↔ pure-Python oracle parity (scrub + quality), on the
deterministic synthetic corpus. This is the F1≥0.99 / byte-equality gate of
FIXTURES.md B3, exercised through the real Arrow-batched plan.
"""

import pandas as pd
import pytest

from pii_filter_spark.operators.quality_stage import quality_stage
from pii_filter_spark.operators.scrub import scrub_stage
from pii_filter_spark.sources.synth import gen_pandas
from tests.oracle import reference_semantics as oracle

N = 400
SEED = 99


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = gen_pandas(N, seed=SEED)[["image_id", "caption"]]
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_scrub_stage_byte_equality(spark, corpus):
    df, pdf = corpus
    got = {
        r["image_id"]: (r["scrubbed_caption"], r["pii_masked"])
        for r in scrub_stage(df).collect()
    }
    assert len(got) == N
    for _, row in pdf.iterrows():
        exp_text, exp_maps = oracle.scrub(row.caption)
        g_text, g_maps = got[row.image_id]
        assert g_text == exp_text, row.caption
        assert len(g_maps) == len(exp_maps)
        for gm, em in zip(g_maps, exp_maps):
            assert gm.placeholder == em["placeholder"]
            assert gm.original_value == em["original_value"]
            assert gm.type == em["type"]
            assert gm.span_start == em["span_start"]
            assert gm.span_end == em["span_end"]


def test_quality_stage_matches_oracle(spark, corpus):
    df, pdf = corpus
    got = {
        r["image_id"]: (r["keep"], list(r["drop_reasons"]))
        for r in quality_stage(df).collect()
    }
    mism = []
    for _, row in pdf.iterrows():
        exp = oracle.quality_drop_reasons(row.caption)
        kp, reasons = got[row.image_id]
        if reasons != exp or kp != (len(exp) == 0):
            mism.append((row.caption, reasons, exp))
    assert not mism, mism[:5]


def test_keep_drop_f1_is_1(spark, corpus):
    """keep/drop F1 vs oracle labels — target >= 0.99 (BASELINE.json)."""
    df, pdf = corpus
    got = {r["image_id"]: r["keep"] for r in quality_stage(df).collect()}
    exp = {
        row.image_id: len(oracle.quality_drop_reasons(row.caption)) == 0
        for _, row in pdf.iterrows()
    }
    tp = sum(1 for k in got if got[k] and exp[k])
    fp = sum(1 for k in got if got[k] and not exp[k])
    fn = sum(1 for k in got if not got[k] and exp[k])
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99


def test_null_caption_safe(spark):
    pdf = pd.DataFrame({"image_id": ["a", "b"], "caption": [None, "foto"]})
    df = spark.createDataFrame(pdf)
    rows = {r["image_id"]: r for r in quality_stage(scrub_stage(df)).collect()}
    assert rows["a"]["drop_reasons"] == ["empty"]
    assert rows["a"]["scrubbed_caption"] == ""
    assert rows["b"]["drop_reasons"] == ["too_short"]


def test_fused_stage_equals_chained_stages(spark, corpus):
    """fused_quality_scrub must be plan-for-plan replaceable with
    scrub_stage(quality_stage(df)) — same columns, same values."""
    from pii_filter_spark.operators.fused import fused_quality_scrub

    df, _ = corpus
    chained = scrub_stage(quality_stage(df))
    fused = fused_quality_scrub(df)
    assert fused.columns == chained.columns
    a = {r["image_id"]: r for r in chained.collect()}
    b = {r["image_id"]: r for r in fused.collect()}
    assert a.keys() == b.keys()
    for k in a:
        ra, rb = a[k].asDict(True), b[k].asDict(True)
        assert ra == rb, k
