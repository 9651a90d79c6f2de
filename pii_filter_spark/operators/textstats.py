"""Text-analysis operators over a document table (training-data pipeline).

All-native where possible (token counts, quality score, fingerprints stay
in codegen); langid is the one model-backed pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..core.langid import detect_language
from .quality_stage import quality_signal_columns

# "BPE-ish" tokenizer regex: word pieces OR single non-space symbols —
# the standard pre-tokenization split used before byte-pair merging.
# Written with unicode property classes (not (?U)\w) so the IDENTICAL
# pattern runs under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_TOKEN_RE = r"[\p{L}\p{N}_]+|[^\p{L}\p{N}_\s]"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, ws_tokens, bpe_tokens, n_chars) — all native expressions."""
    c = F.col(text_col)
    trimmed = F.trim(c)
    ws = F.when(
        c.isNotNull() & (trimmed != ""), F.size(F.split(trimmed, r"\s+"))
    ).otherwise(F.lit(0))
    bpe = F.when(c.isNotNull(), F.regexp_count(c, F.lit(BPE_TOKEN_RE))).otherwise(0)
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length(F.coalesce(c, F.lit(""))).alias("n_chars"),
    )


def bpe_exact_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bpe_tokens) — tokenizer-EXACT byte-level BPE counts under
    the frozen vocab (core/bpe.py), one Arrow-batched pandas UDF. This is
    the count training-export stages must use (pack_sequences boundaries,
    mixture token budgets); the native regex count in token_counts is the
    cheap pre-tokenization approximation for monitoring only."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _bpe(s: pd.Series) -> pd.Series:
        from ..core.bpe import bpe_token_counts_batch

        return pd.Series(bpe_token_counts_batch(s), dtype="int64")

    return df.select(F.col(id_col), _bpe(F.col(text_col)).alias("n_bpe_tokens"))


def bpe_counts_from_merges_txt(
    df: DataFrame,
    merges_txt: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) under an ARBITRARY released-format vocabulary:
    `merges_txt` is the content of a GPT-2-layout merges.txt (core/bpe
    parse_merges_txt), shipped to executors by closure capture (a merge
    table is ~KBs–1 MB — broadcast-variable territory is unnecessary) and
    parsed ONCE per worker. This is the public-vocab seam's Spark stage:
    point it at the target model's merges.txt and every count downstream
    (packing boundaries, mixture budgets) is that tokenizer's exact
    number."""
    from pyspark.sql.functions import pandas_udf

    holder: list = []

    @pandas_udf("long")
    def _bpe(s: pd.Series) -> pd.Series:
        from ..core.bpe import ByteBPE

        if not holder:
            holder.append(ByteBPE.from_merges_txt(merges_txt))
        return pd.Series(holder[0].counts_batch(s), dtype="int64")

    return df.select(F.col(id_col), _bpe(F.col(text_col)).alias("n_bpe_tokens"))


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1] from the shared signal expressions.

    score = mean of 4 subscores: length band, alpha ratio, symbol cleanliness,
    line diversity. Deterministic, all-native."""
    s = quality_signal_columns(F.col(text_col))
    length_ok = (
        F.when(s["word_count"] >= 20, 1.0)
        .when(s["word_count"] >= 5, 0.5)
        .otherwise(0.0)
    )
    alpha = F.least(s["alpha_ratio"] / 0.9, F.lit(1.0))
    symbols = F.greatest(F.lit(0.0), F.lit(1.0) - s["symbol_ratio"] * 5.0)
    diversity = F.lit(1.0) - s["repeated_line_ratio"]
    score = (length_ok + alpha + symbols + diversity) / 4.0
    return df.select(
        F.col(id_col), F.round(score, 6).alias("quality_score")
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 digest of whitespace-normalized lowercase
    text (exact-dup key) + a 64-bit xxhash (cheap join key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                            r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint_64"),
    )


def language_id_col(text_col) -> "F.Column":
    """Language-ID as a COLUMN (Arrow UDF) — composable without a join:
    `df.withColumn("lang", language_id_col(F.col("text")))` adds the
    language in place, no shuffle."""

    @F.pandas_udf(StringType())
    def _lang(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [detect_language(t) if isinstance(t, str) else "und" for t in texts]
        )

    return _lang(text_col)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        language_id_col(F.col(text_col)).alias("lang_detected"),
    )


def perplexity_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, ppl): char-trigram perplexity, rounded to 4 decimals."""
    from pyspark.sql.types import DoubleType

    from ..core.perplexity import perplexity_batch

    @F.pandas_udf(DoubleType())
    def _ppl(texts: pd.Series) -> pd.Series:
        return pd.Series(perplexity_batch(texts), dtype="float64")

    return df.select(
        F.col(id_col), F.round(_ppl(F.col(text_col)), 4).alias("ppl")
    )


def stratified_take(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Deterministic stratified subsample: the first n rows per stratum
    in md5(id)-order — the data-mixing/curation shape (cap each language
    / source / quality bucket at a quota) with cluster-invariant row
    selection. md5 over the stringified id gives an order-stable,
    engine-portable pseudo-random permutation (same expression exists in
    DuckDB, so the oracle is plain SQL — unlike xxhash64).

    TWO-PHASE window for skew: strata are often few and huge (5 language
    values over 10^12 rows), so a single window per stratum would push a
    whole language through one task. Phase 1 takes the local top-n per
    (stratum, salt(id)) — salt_buckets way spread, each partition
    bounded; phase 2 re-ranks only the ≤ n*salt_buckets survivors per
    stratum. Selection is by a TOTAL order (md5, id), so the two-phase
    result is row-identical to the single-window form: the global top-n
    of a stratum is contained in the union of its per-salt top-n."""
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(stratum_col, salt).orderBy(h, id_col)
    local = (
        df.withColumn("_lrn", F.row_number().over(w1))
        .where(F.col("_lrn") <= n_per_stratum)
    )
    w2 = Window.partitionBy(stratum_col).orderBy(h, id_col)
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= n_per_stratum)
        .select(stratum_col, id_col, F.col("_rn").alias("sample_rank"))
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    "repetitious" filters, adapted to sentence granularity because the
    corpus rows are single-line):

      * dup_sent_frac — fraction of sentences that are duplicates of an
        earlier sentence (1 - distinct/total);
      * top_word_frac — fraction of word occurrences taken by the single
        most frequent word.

    The sentence metrics are in-row HOFs (sentences per doc are few; the
    split uses the SAME RE2-safe pattern as the sentence UDTF so DuckDB
    reproduces it verbatim). The top-word count is RELATIONAL — explode
    words, count per (doc, word), max/sum per doc — because the in-row
    alternative is O(distinct × words) per document: quadratic on a
    100k-word web document. The shuffle keys on (doc, word), so hot
    words do not concentrate (doc_id spreads them), and word counting
    is strictly linear."""
    sents_raw = F.expr(
        f"regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0)"
    )
    staged = df.select(
        id_col,
        F.filter(
            F.transform(sents_raw, lambda s: F.trim(s)), lambda s: s != ""
        ).alias("_sents"),
        # split('') yields [''] — drop empties so blank docs count 0 words
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
        ).alias("_words"),
    )
    n_sent = F.size("_sents")
    dup_frac = F.when(
        n_sent > 0,
        F.round(
            1.0
            - F.size(F.array_distinct("_sents")).cast("double") / n_sent, 4
        ),
    ).otherwise(F.lit(0.0))
    sent_stats = staged.select(
        id_col,
        n_sent.alias("n_sentences"),
        dup_frac.alias("dup_sent_frac"),
        F.size("_words").alias("_n_words"),
    )
    word_counts = (
        staged.select(id_col, F.explode_outer("_words").alias("_w"))
        .where(F.col("_w").isNotNull())
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"))
    )
    joined = sent_stats.join(word_counts, id_col, "left")
    top_frac = F.when(
        F.col("_n_words") > 0,
        F.round(F.col("_top").cast("double") / F.col("_n_words"), 4),
    ).otherwise(F.lit(0.0))
    return joined.select(
        id_col,
        "n_sentences",
        "dup_sent_frac",
        top_frac.alias("top_word_frac"),
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag documents sharing any word n-gram
    with a benchmark/eval set (the GPT-3/PaLM data-prep recipe; n=8 is
    the conventional window). Output: (id, contaminated boolean).

    Plan: both sides normalize identically (lower, whitespace-collapse)
    and explode to distinct n-gram rows; the benchmark side is tiny by
    definition (an eval set), so the semi-join broadcasts — each doc
    n-gram probes a hash map, no shuffle of the corpus side. Docs
    shorter than n words cannot be contaminated. At production scale
    the benchmark n-gram set is exactly the bloom-filter build side;
    the semi-join keeps the declarative form.
    """
    def grams(df, tcol, carry):
        toks = F.filter(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(tcol))), r"\s+", " "), " "),
            lambda w: w != "",
        )
        staged = df.select(*carry, toks.alias("_t")).where(F.size("_t") >= n)
        g = F.transform(
            F.sequence(F.lit(0), F.size("_t") - n),
            lambda i: F.concat_ws(" ", F.slice("_t", i + 1, n)),
        )
        return staged.select(*carry, F.explode(F.array_distinct(g)).alias("_g"))

    bench_grams = grams(benchmark, bench_text_col, []).distinct()
    doc_grams = grams(docs, text_col, [id_col])
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g", "leftsemi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level vocabulary stats: the k most frequent word n-grams
    with counts — the standard corpus-inspection step before choosing
    boilerplate/stop filters. Output: (ngram, cnt, rank), rank 1-based
    with (count desc, ngram asc) ties.

    Plan: explode n-grams (NOT distinct per doc — corpus frequency
    counts every occurrence), groupBy with map-side partial aggregation,
    then a two-phase top-k: local top-k per hash-salt of the ngram, then
    one tiny global sort of <= salt_buckets*k survivors — no global sort
    of the full vocabulary ever happens."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "),
        lambda w: w != "",
    )
    staged = df.select(toks.alias("_t")).where(F.size("_t") >= n)
    grams = staged.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.concat_ws(" ", F.slice("_t", i + 1, n)),
            )
        ).alias("ngram")
    )
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    salt = F.pmod(F.xxhash64("ngram"), F.lit(32))
    w1 = Window.partitionBy(salt).orderBy(F.desc("cnt"), F.asc("ngram"))
    local = counts.withColumn("_r", F.row_number().over(w1)).where(
        F.col("_r") <= k
    )
    w2 = Window.partitionBy().orderBy(F.desc("cnt"), F.asc("ngram"))
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("ngram", "cnt", "rank")
    )
