"""DSIR-style importance resampling for target-domain data selection.

Implements the hashed-n-gram importance-weight recipe of Xie et al. 2023
("Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): estimate token-bucket distributions for a TARGET slice
and for the RAW pool, score every raw document by the sum of per-token
log-likelihood ratios log(p_target(b)/p_raw(b)), and keep the top-k
scored documents as the domain-matched training subset.  This is the
standard "make 100 TB of crawl look like my curated target" selection
step that sits in front of the quality/PII stages in this engine
(reference scope: the curation layer around
/root/reference/src/core/text_processor.py — the reference filters;
DSIR chooses WHAT to filter at corpus scale).

Engine-portability is engineered in three places so an independent
oracle reproduces the result bit-for-bit:

* bucket assignment is a portable md5-prefix hash (same recipe as the
  KMV sketch in operators/sketch.py) — no engine-private hash;
* the per-bucket log-ratio is computed ONCE, driver-side, in pure
  Python from EXACT integer bucket counts (`ratio_table_rows`) and fed
  to the cluster as literals — no engine ever evaluates `ln()`, so a
  1-ulp libm/JVM-Math disagreement at a rounding boundary can never
  flip a quantized value (round-3 driver hash-FAIL root cause);
* the log-ratio is quantized to integer micro-nats before the
  per-document sum, so the document score is an exact integer SUM —
  independent of float summation order across engines, partitionings,
  and AQE decisions.

Scale shape (10^12 docs): explode tokens -> groupBy(bucket) with
map-side partial aggregation into a <= num_buckets-row exact count
table (bounded collect — the mixing.mixture_rates pattern) -> pure-
Python log-ratios -> the <= num_buckets ratio values constant-fold into
ONE literal array, and every raw document scores itself in place with a
single `aggregate` higher-order function (per-token md5 bucket ->
element_at into the literal -> exact long sum) -> TakeOrderedAndProject
for the global top-k.  The scoring side therefore has ZERO shuffles: no
exploded-token exchange keyed by doc_id (the previous shape's dominant
cost — token rows outnumber documents by the mean doc length), no join.
No global sort of the corpus, no skew risk (md5 buckets are uniform by
construction), and the only driver-side state is the count/ratio table,
capped at num_buckets rows.  The integer micro-nat sum is
order-independent, so the HOF fold is bit-identical to the previous
groupBy sum and to the fixture oracle.  The token stream is recomputed
for the two consumers rather than cached — at 100 TB a second columnar
scan is cheaper than materializing an exploded token table.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_array(text_col: str) -> Column:
    """Whitespace tokens of lowercased text — the SAME tokenization as
    textstats.top_ngrams / contamination_flags so one DuckDB recipe
    (regexp_replace + string_split + list_filter) oracles all of them."""
    return F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        ),
        lambda w: w != "",
    )


def hashed_bucket(col: Column, num_buckets: int) -> Column:
    """Portable token -> bucket hash: first 28 bits of md5, mod buckets.
    Pure-Python twin: int(md5(w.encode()).hexdigest()[:7], 16) % buckets;
    DuckDB equivalent:
    CAST(concat('0x', substr(md5(w), 1, 7)) AS BIGINT) % num_buckets."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 7), 16, 10).cast("long"),
        F.lit(num_buckets),
    )


def _half_up_int(x: float) -> int:
    """BigDecimal-style HALF_UP on the shortest-repr decimal — kept for
    continuity with the previous F.round(…) semantics.  Parity needs only
    "one function, evaluated once", which driver-side computation gives."""
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def log_ratio_unats(
    ct: int, cr: int, tt: int, tr: int, num_buckets: int, alpha: float = 0.5
) -> int:
    """Smoothed log(p_target/p_raw) for one bucket, in integer micro-nats.
    Pure function of exact integer counts — the single place `ln` is ever
    evaluated; shared verbatim by the Spark plan (as literals) and the
    fixture oracle (oracle_support.dsir_selection_sql)."""
    lr = math.log((ct + alpha) / (tt + alpha * num_buckets)) - math.log(
        (cr + alpha) / (tr + alpha * num_buckets)
    )
    return _half_up_int(lr * 1e6)


def ratio_table_rows(
    counts: Dict[int, Tuple[int, int]], num_buckets: int, alpha: float = 0.5
) -> List[Tuple[int, int]]:
    """(bucket, lr_unats) rows from exact per-bucket (target, raw) counts.
    <= num_buckets rows — broadcastable by construction."""
    tt = sum(ct for ct, _ in counts.values())
    tr = sum(cr for _, cr in counts.values())
    return [
        (b, log_ratio_unats(ct, cr, tt, tr, num_buckets, alpha))
        for b, (ct, cr) in sorted(counts.items())
    ]


def _bucket_counts(tokens: DataFrame) -> Dict[int, Tuple[int, int]]:
    """Exact per-bucket (target, raw) token counts for a token frame
    with columns (_b: long bucket, _tgt: boolean).  Collected driver-side
    (<= num_buckets rows, the bounded mixing.mixture_rates pattern)."""
    return {
        int(r["_b"]): (int(r["ct"]), int(r["cr"]))
        for r in tokens.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
            F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).alias("cr"),
        )
        .collect()
    }


def dsir_bucket_log_ratios(
    tokens: DataFrame,
    *,
    num_buckets: int,
    alpha: float = 0.5,
) -> DataFrame:
    """(bucket, lr_unats) ratio table as a DataFrame — the transcendental
    step runs once, driver-side, in `log_ratio_unats`."""
    rows = ratio_table_rows(_bucket_counts(tokens), num_buckets, alpha)
    return tokens.sparkSession.createDataFrame(
        rows, "_b long, lr_unats long"
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    alpha: float = 0.5,
    k: int = 100,
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight against the target
    slice selected by `is_target`.  Returns (id_col, dsir_weight_unats),
    deterministic under the total order (weight desc, id asc)."""
    tok = df.select(
        is_target.alias("_tgt"),
        F.explode(_token_array(text_col)).alias("_w"),
    ).select("_tgt", hashed_bucket(F.col("_w"), num_buckets).alias("_b"))
    counts = _bucket_counts(tok)
    lr = dict(ratio_table_rows(counts, num_buckets, alpha))
    # dense bucket -> micro-nat lookup; buckets never seen in the count
    # pass cannot appear at scoring time (scoring tokens are a subset of
    # counted tokens), but get the principled (0, 0) smoothed value
    tt = sum(ct for ct, _ in counts.values())
    tr = sum(cr for _, cr in counts.values())
    empty = log_ratio_unats(0, 0, tt, tr, num_buckets, alpha)
    ratio_arr = F.array(
        *[F.lit(int(lr.get(b, empty))) for b in range(num_buckets)]
    )  # all-literal CreateArray — constant-folds into ONE array literal
    scored = (
        df.where(~is_target)
        .select(F.col(id_col), _token_array(text_col).alias("_toks"))
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            F.aggregate(
                "_toks",
                F.lit(0).cast("long"),
                lambda acc, w: acc
                + F.element_at(
                    ratio_arr,
                    (hashed_bucket(w, num_buckets) + F.lit(1)).cast("int"),
                ),
            ).alias("dsir_weight_unats"),
        )
    )
    return scored.orderBy(
        F.desc("dsir_weight_unats"), F.asc(id_col)
    ).limit(k)
