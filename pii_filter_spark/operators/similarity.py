"""Approximate-nearest-neighbor search over an embedding column.

Two paths over `embeddings(vec_id, embedding array<float>, label)`:

  * brute-force cosine top-k — the exactness baseline. The dot product and
    norms are NATIVE higher-order-function expressions (zip_with +
    aggregate), so the scan stays in whole-stage codegen and the only
    Python anywhere is the driver literal for the query vector. Top-k is
    orderBy+limit, which Spark executes as per-partition TakeOrdered + a
    tiny final merge — no global sort shuffle.

  * LSH-bucketed (random hyperplane / SRP) — the scale path. A fixed-seed
    plane matrix (one numpy matmul per Arrow batch inside a pandas UDF)
    gives every row a signature; candidates are rows whose signature
    agrees with the query's on >= (planes - max_flip) bits, checked with
    bit_count(xor) natively — a full-scan-but-cheap filter here; at real
    scale the signature becomes the table's partition/bucket key so the
    probe prunes partitions instead of scanning.

  * IVF (k-means coarse quantizer) — the other classic scale path:
    train_ivf_centroids (deterministic driver-side k-means on a bounded
    sample) + ivf_assign (cluster column; the table's partition key at
    production scale) + cosine_topk_ivf (probe nprobe clusters with a
    native IN-list predicate → partition pruning, then exact cosine).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _dot_expr(vec_col, query: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k, fully JVM-side."""
    qnorm = float(np.sqrt(np.dot(query, query)))
    sim = _dot_expr(F.col(vec_col), query) / (_norm_expr(F.col(vec_col)) * F.lit(qnorm))
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def srp_signature_udf(dim: int, planes: int = 16, seed: int = 31):
    """Signed-random-projection signature as a long (bit i = sign of proj i)."""
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((dim, planes))

    @F.pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        if len(vecs):
            arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            bits = (arr @ mat) > 0
            out = (bits.astype(np.int64) << np.arange(planes, dtype=np.int64)).sum(axis=1)
        return pd.Series(out, dtype="int64")

    return _sig


def srp_query_signature(query: Sequence[float], planes: int = 16, seed: int = 31) -> int:
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((len(query), planes))
    bits = (np.asarray(query, dtype=np.float64) @ mat) > 0
    return int((bits.astype(np.int64) << np.arange(planes, dtype=np.int64)).sum())


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    planes: int = 16,
    max_flip: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 31,
) -> DataFrame:
    """Approximate top-k: SRP bucket filter, exact cosine on survivors."""
    dim = len(query)
    sig_udf = srp_signature_udf(dim, planes, seed)
    qsig = srp_query_signature(query, planes, seed)
    qnorm = float(np.sqrt(np.dot(query, query)))
    candidates = df.withColumn("_sig", sig_udf(F.col(vec_col))).where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_flip
    )
    sim = _dot_expr(F.col(vec_col), query) / (_norm_expr(F.col(vec_col)) * F.lit(qnorm))
    return (
        candidates.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_norms(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    return df.select(F.col(id_col), _norm_expr(F.col(vec_col)).alias("l2_norm"))


def cosine_near_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cos_sim >= t).

    Broadcast-matmul brute force: the (id, unit-vector) matrix is collected
    to the driver, broadcast to executors, and each Arrow batch does ONE
    numpy matmul against it — no crossJoin, no shuffle, vectorized end to
    end. This is the correctness baseline / small-side verifier: it is the
    right plan whenever one side fits in executor memory (here: the whole
    table, mirroring a dedup pass where the dictionary side is bounded).
    For tables where no side fits, use cosine_near_pairs_lsh. The
    bounded-side precondition is ENFORCED: more than `max_rows` rows
    raises instead of silently OOMing the driver at scale.
    """
    probe = df.select(id_col).limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"cosine_near_pairs_exact: input exceeds max_rows={max_rows} "
            "(driver-collected broadcast baseline); use cosine_near_pairs_lsh "
            "for unbounded tables, or raise max_rows explicitly."
        )
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def _pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, idv = b_mat.value, b_ids.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ m.T
            qid = pdf[id_col].to_numpy(dtype=np.int64)
            # id_a < id_b keeps each unordered pair exactly once
            ri, ci = np.nonzero((sims >= threshold) & (qid[:, None] < idv[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": qid[ri],
                    "id_b": idv[ci],
                    "cos_sim": sims[ri, ci],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        _pairs, schema="id_a long, id_b long, cos_sim double"
    )


def cosine_near_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    planes: int = 16,
    chunks: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 31,
    dim: int = 64,
    max_bucket_size: int = None,
) -> DataFrame:
    """Scale path: SRP-signature chunk bucketing (any pair of vectors at
    angle <= theta agrees on a whole chunk with high probability), bucket
    collect_list, in-array pair expansion with exact cosine verification —
    same no-self-join shape as minhash_lsh_pairs/simhash_near_pairs, so
    the signature UDF runs once and only verified pairs leave the task.
    Buckets above `max_bucket_size` (identical/boilerplate embeddings
    piling into one SRP chunk value at 10^12-row scale) take the linear
    star reroute instead of the quadratic expansion — see
    dedup._bucket_pair_expansion.

    The norm is computed ONCE per row as a struct field (an O(d)
    aggregate); normalizing inside a transform lambda instead would
    re-evaluate it per element (O(d^2) per row — Catalyst does not hoist
    loop-invariant subexpressions out of HOF lambdas). Zero-norm vectors
    are dropped up front: they have no cosine direction and would
    otherwise emit NaN pairs silently."""
    from .dedup import (
        DEFAULT_MAX_BUCKET,
        _VECTORIZE_FROM,
        _bucket_pair_expansion,
        _ordered_id_pairs,
    )

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET
    bits_per = planes // chunks
    mask = (1 << bits_per) - 1
    sig_udf = srp_signature_udf(dim, planes, seed)
    sigs = df.select(
        F.col(id_col),
        F.col(vec_col),
        sig_udf(F.col(vec_col)).alias("_sig"),
    ).select(
        F.struct(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            _norm_expr(F.col(vec_col)).alias("nrm"),
        ).alias("m"),
        F.array(
            *[
                F.shiftright("_sig", bits_per * i).bitwiseAND(F.lit(mask))
                for i in range(chunks)
            ]
        ).alias("keys"),
    ).where(F.col("m.nrm") > 0)
    chunked = sigs.select(
        # outer: plain posexplode inserts a size>0 pre-filter below the
        # Generate that drags the SRP UDF below the exchange (double eval)
        "m", F.posexplode_outer("keys").alias("chunk_idx", "chunk_val")
    )
    members = (
        chunked.groupBy("chunk_idx", "chunk_val")
        .agg(F.collect_list("m").alias("ms"))
        .where(F.size("ms") > 1)
    )
    id_type = dict(df.dtypes)[id_col]
    return cosine_pairs_from_buckets(members, threshold, max_bucket_size, id_type)


def cosine_pairs_from_buckets(
    members: DataFrame,
    threshold: float,
    max_bucket_size: int,
    id_type: str,
) -> DataFrame:
    """Verified cosine pairs from pre-bucketed candidates: `members` has
    an `ms` column of array<struct<id, v:array<double>, nrm:double>>
    (any bucketing — SRP chunks, IVF clusters). Shared by
    cosine_near_pairs_lsh and semdedup so the hybrid native/vectorized
    expansion (and its bit-parity contract) lives in one place."""
    from .dedup import (
        _VECTORIZE_FROM,
        _bucket_pair_expansion,
        _ordered_id_pairs,
    )

    def _cos(x, y):
        return F.aggregate(
            F.zip_with(x["v"], y["v"], lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ) / (x["nrm"] * y["nrm"])

    def _pair(x, y):
        return F.struct(
            F.when(x["id"] < y["id"], x["id"]).otherwise(y["id"]).alias("id_a"),
            F.when(x["id"] < y["id"], y["id"]).otherwise(x["id"]).alias("id_b"),
            _cos(x, y).alias("cos_sim"),
        )

    # Hybrid expansion, mirroring dedup.minhash_lsh_pairs: cosine verify
    # is a 64-element interpreted fold per candidate, so medium/large
    # buckets route through a vectorized numpy pass while the tiny-bucket
    # tail stays native. The numpy dot accumulates LEFT-TO-RIGHT over
    # components — bit-identical to the HOF fold (numpy's pairwise-sum
    # dot would round differently and could flip a threshold boundary).
    # One dropDuplicates over the union keeps each pair once (the cosine
    # is identical in every colliding chunk).
    small = members.where(
        (F.size("ms") <= _VECTORIZE_FROM) | (F.size("ms") > max_bucket_size)
    )
    native = _bucket_pair_expansion(
        small,
        _pair,
        lambda p: p["cos_sim"] >= threshold,
        max_bucket_size,
    )
    big = members.where(
        (F.size("ms") > _VECTORIZE_FROM) & (F.size("ms") <= max_bucket_size)
    )

    def _vec_fn(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for ms in pdf["ms"]:
                m = len(ms)
                ids = np.array([x["id"] for x in ms])  # int64 or unicode
                vecs = np.array([x["v"] for x in ms], dtype=np.float64)
                nrm = np.fromiter((x["nrm"] for x in ms), dtype=np.float64,
                                  count=m)
                acc = np.zeros((m, m), dtype=np.float64)
                for k in range(vecs.shape[1]):  # left-to-right like the fold
                    c = vecs[:, k]
                    acc += c[:, None] * c[None, :]
                cos = acc / (nrm[:, None] * nrm[None, :])
                iu, ju = np.triu_indices(m, 1)
                cs = cos[iu, ju]
                keep = cs >= threshold
                lo, hi = _ordered_id_pairs(ids, iu, ju, keep)
                out_a.extend(lo.tolist())
                out_b.extend(hi.tolist())
                out_c.extend(cs[keep].tolist())
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cos_sim": out_c}
            )

    vectorized = big.mapInPandas(
        _vec_fn, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )
    return native.unionByName(vectorized).dropDuplicates(["id_a", "id_b"])


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 17,
) -> np.ndarray:
    """Deterministic k-means coarse quantizer (IVF training).

    Trains driver-side on a bounded sample — the standard IVF recipe:
    the codebook is tiny (k × dim) and training needs one pass over a
    sample, not the table. numpy only, fixed iteration count, seeded
    init, and the sample is taken in `id_col` order (plain limit() picks
    rows by partition layout), so the same data yields the same centroids
    on any cluster."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    rows = [(r[1],) for r in rows]
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds `ivf_cluster`: nearest-centroid id per row (one numpy matmul
    per Arrow batch). At production scale this column becomes the
    table's partition/bucket key so probes prune partitions."""
    b_cent = df.sparkSession.sparkContext.broadcast(centroids)

    @F.pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        cent = b_cent.value
        if not len(vecs):
            return pd.Series([], dtype="int64")
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        arr = arr / np.linalg.norm(arr, axis=1, keepdims=True)
        return pd.Series(np.argmax(arr @ cent.T, axis=1).astype(np.int64))

    return df.withColumn("ivf_cluster", _assign(F.col(vec_col)))


def cosine_topk_ivf(
    df: DataFrame,
    query: Sequence[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: exact cosine top-k over only the `nprobe` clusters
    nearest to the query. The cluster filter is a native IN-list
    predicate — with the table partitioned by ivf_cluster it becomes
    partition pruning instead of a scan-and-filter."""
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(centroids @ q))[:nprobe].tolist()
    qnorm = float(np.linalg.norm(query))
    assigned = ivf_assign(df, centroids, vec_col)
    sim = _dot_expr(F.col(vec_col), query) / (_norm_expr(F.col(vec_col)) * F.lit(qnorm))
    return (
        assigned.where(F.col("ivf_cluster").isin(probes))
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame,
    queries: "np.ndarray",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors (Q x D numpy) —
    the realistic retrieval shape (one driver query per probe doesn't
    scale past a handful of lookups).

    Plan: the query matrix broadcasts; each PARTITION computes cosines
    for all queries in one numpy pass and keeps only its local top-k per
    query (the mapInPandas generator accumulates across the partition's
    Arrow batches and yields once), so at most partitions * Q * k rows
    ever leave the scan; a tiny global window re-ranks them to the final
    top-k. Cosines accumulate component-by-component (acc += v_k * q_k),
    NOT via BLAS matmul: BLAS blocking changes summation order with
    batch size, which would make results depend on partitioning — the
    explicit loop is deterministic for any split and is what the fixture
    oracle replicates. Ties break by id ascending.

    Output: (query_idx int, vec_id, cos_sim double, rank int)."""
    from pyspark.sql import Window

    q = np.asarray(queries, dtype=np.float64)
    qnorm = np.sqrt((q * q).sum(axis=1))
    spark = df.sparkSession
    b_q = spark.sparkContext.broadcast(q)
    b_qn = spark.sparkContext.broadcast(qnorm)
    id_type = dict(df.dtypes)[id_col]

    def _local_topk(batches):
        qm, qn = b_q.value, b_qn.value
        nq, dim = qm.shape
        best_sim = [[] for _ in range(nq)]
        best_id = [[] for _ in range(nq)]
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            ids = np.array(list(pdf[id_col]))
            acc = np.zeros((len(vecs), nq), dtype=np.float64)
            for c in range(dim):  # deterministic order, see docstring
                acc += vecs[:, c][:, None] * qm[None, :, c]
            vn = np.zeros(len(vecs), dtype=np.float64)
            for c in range(dim):
                vn += vecs[:, c] * vecs[:, c]
            cos = acc / (np.sqrt(vn)[:, None] * qn[None, :])
            for qi in range(nq):
                best_sim[qi].extend(cos[:, qi].tolist())
                best_id[qi].extend(ids.tolist())
                if len(best_sim[qi]) > 4 * k:
                    order = sorted(
                        range(len(best_sim[qi])),
                        key=lambda i: (-best_sim[qi][i], best_id[qi][i]),
                    )[:k]
                    best_sim[qi] = [best_sim[qi][i] for i in order]
                    best_id[qi] = [best_id[qi][i] for i in order]
        out_q, out_id, out_c = [], [], []
        for qi in range(nq):
            order = sorted(
                range(len(best_sim[qi])),
                key=lambda i: (-best_sim[qi][i], best_id[qi][i]),
            )[:k]
            out_q.extend([qi] * len(order))
            out_id.extend(best_id[qi][i] for i in order)
            out_c.extend(best_sim[qi][i] for i in order)
        yield pd.DataFrame(
            {"query_idx": out_q, id_col: out_id, "cos_sim": out_c}
        )

    local = df.select(id_col, vec_col).mapInPandas(
        _local_topk,
        schema=f"query_idx int, {id_col} {id_type}, cos_sim double",
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_idx", id_col, "cos_sim", "rank")
    )
