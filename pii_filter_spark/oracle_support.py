"""Computed-literal DuckDB oracles for model-backed queries.

The driver's correctness gate runs each queries() entry on Spark AND its
oracle_sql() string on DuckDB, comparing value hashes. Model-backed
operators (langid, perplexity, minhash, simhash, SRP-LSH, IVF) are not
SQL-expressible — but they ARE deterministic pure functions, so their
expected outputs can be PRECOMPUTED from the same parquet the oracle
reads and emitted as a literal VALUES relation (round-1 VERDICT #9:
"convert ○ rows-only checks to ⊕-grade evidence via fixtures").

Every generator recomputes through the SAME pure function the Spark UDF
calls (minhash_sig, simhash64, detect_language, perplexity, the numpy
SRP/IVF math), so the oracle is an independent executor-free evaluation
of identical semantics, not a copy of Spark's output. Floating-point
results replicate Spark's arithmetic exactly: higher-order-function
aggregates fold left-to-right (NOT numpy pairwise sums) and F.round's
BigDecimal HALF_UP is matched with decimal.Decimal on repr().

Generators read the parquet with DuckDB (no Spark session) and take
~100 ms total at sf0.01. oracle_sql() calls them inside a try/except:
if the fixture dir is absent or anything fails, the affected queries
simply stay rows-only — never a red row from a fixture bug.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import List, Sequence, Tuple

import duckdb
import numpy as np


def _round_like_spark(v: float, scale: int = 4) -> float:
    """Spark F.round(double, n): BigDecimal.valueOf (shortest repr) +
    HALF_UP. Decimal(repr(v)) has identical semantics."""
    if v != v or v in (float("inf"), float("-inf")):
        return v
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))


def _fold_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """zip_with(*, +-aggregate) with Spark's left-to-right fold order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _fold_norm(a: Sequence[float]) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _values_sql(rows: List[tuple], cols: List[str], types: List[str]) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float):
            # bare nan/inf tokens are not parseable DuckDB literals
            if v != v:
                return "'NaN'::DOUBLE"
            if v == float("inf"):
                return "'Infinity'::DOUBLE"
            if v == float("-inf"):
                return "'-Infinity'::DOUBLE"
            return repr(v)
        return str(v)

    if not rows:  # 'VALUES\n\n' would be a parse error
        empty = ", ".join(
            f"CAST(NULL AS {t}) AS {c}" for c, t in zip(cols, types)
        )
        return f"SELECT {empty} WHERE FALSE"
    body = ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    casts = ", ".join(
        f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types)
    )
    return (
        f"SELECT {casts} FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"
    )


def _read_docs(sf_dir: str) -> List[Tuple[int, str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def _read_embeddings(sf_dir: str) -> List[Tuple[int, list]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


# ---------------------------------------------------------------------------
# text-model oracles
# ---------------------------------------------------------------------------

def simhash_sql(sf_dir: str) -> str:
    from .operators.dedup import simhash64

    rows = [(d, simhash64(t)) for d, t in _read_docs(sf_dir)]
    return _values_sql(rows, ["doc_id", "simhash"], ["BIGINT", "BIGINT"])


def langid_sql(sf_dir: str) -> str:
    from .core.langid import detect_language

    rows = [(d, detect_language(t)) for d, t in _read_docs(sf_dir)]
    return _values_sql(rows, ["doc_id", "lang_detected"], ["BIGINT", "VARCHAR"])


def perplexity_sql(sf_dir: str) -> str:
    from .core.perplexity import perplexity

    rows = [
        (d, _round_like_spark(perplexity(t))) for d, t in _read_docs(sf_dir)
    ]
    return _values_sql(rows, ["doc_id", "ppl"], ["BIGINT", "DOUBLE"])


def ccnet_bins_sql(sf_dir: str, sample_per_lang: int = 256) -> str:
    """Pure twin of operators/ccnet_bins.ccnet_bins: same langid/ppl
    models, same md5(id)-order bounded sample, same discrete tercile
    cutoffs, same <= comparisons."""
    import hashlib

    from .core.langid import detect_language
    from .core.perplexity import perplexity
    from .operators.ccnet_bins import HEAD, MIDDLE, TAIL, tercile_cutoffs

    docs = _read_docs(sf_dir)
    lang = {d: detect_language(t) for d, t in docs}
    ppl = {d: _round_like_spark(perplexity(t)) for d, t in docs}

    by_lang: dict = {}
    for d, _ in docs:
        by_lang.setdefault(lang[d], []).append(d)
    cuts = {}
    for lg, ids in by_lang.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        cuts[lg] = tercile_cutoffs(
            sorted(ppl[i] for i in ids[:sample_per_lang])
        )

    rows = []
    for d, _ in docs:
        t_head, t_mid = cuts[lang[d]]
        b = HEAD if ppl[d] <= t_head else MIDDLE if ppl[d] <= t_mid else TAIL
        rows.append((d, lang[d], ppl[d], b))
    return _values_sql(
        rows,
        ["doc_id", "lang", "ppl", "bin"],
        ["BIGINT", "VARCHAR", "DOUBLE", "VARCHAR"],
    )


def ccnet_normalize_sql(sf_dir: str) -> str:
    """Pure twin of operators/ccnet_normalize.ccnet_normalize: same
    frozen translate tables, same op order, same md5 digest."""
    from .operators.ccnet_normalize import normalize_digest, normalize_text

    rows = [
        (d, normalize_text(t), normalize_digest(t))
        for d, t in _read_docs(sf_dir)
    ]
    return _values_sql(
        rows,
        ["doc_id", "norm_text", "norm_digest"],
        ["BIGINT", "VARCHAR", "VARCHAR"],
    )


def image_sharpness_sql(n: int = 120, seed: int = 42) -> str:
    """Pure twin of q_image_sharpness: same synth rows, same box-blur /
    flat-placeholder variants, same numpy metrics and thresholds."""
    from .images import decode_image
    from .images.codecs import encode_image
    from .images.sharpness import box_blur
    from .operators.image_sharpness import (
        ENTROPY_MIN,
        LAPVAR_MIN,
        flat_placeholder_rows,
        sharpness_row,
    )

    rows = []

    def emit(iid: str, data: bytes) -> None:
        try:
            lv, ent = sharpness_row(data)
        except (ValueError, NotImplementedError):
            lv = ent = None
        keep = lv is not None and lv >= LAPVAR_MIN and ent >= ENTROPY_MIN
        rows.append((iid, lv, ent, keep))

    synth = _synth_rows(n, seed)
    for r in synth:
        emit(r["image_id"], bytes(r["bytes"]))
    for i, r in enumerate(synth):
        if i % 4 == 0:
            try:
                px = decode_image(bytes(r["bytes"]))
            except (ValueError, NotImplementedError):
                continue
            emit(r["image_id"] + "~blur", encode_image(box_blur(px), "png"))
    for iid, data in flat_placeholder_rows():
        emit(iid, data)
    return _values_sql(
        rows,
        ["image_id", "lap_var", "entropy", "keep"],
        ["VARCHAR", "DOUBLE", "DOUBLE", "BOOLEAN"],
    )


def cross_modal_dedup_sql(
    n: int = 120, seed: int = 42, fresh_seed: int = 777,
    quality: int = 90, max_hamming: int = 7,
) -> str:
    """Pure twin of q_cross_modal_dedup: same input construction, caption
    groups via the same normalize_text digest, image pairs via all-pairs
    hamming <= 7 (exact — the operator's chunks=8 banding is pigeonhole-
    exact at <= 7 and the asserted bucket sizes keep caps from firing),
    union-find, min-id cluster labels."""
    import hashlib

    from .images import decode_image
    from .images.codecs import encode_image
    from .images.phash import phash64
    from .operators.ccnet_normalize import normalize_text

    rows = []  # (image_id, bytes, caption)
    synth = _synth_rows(n, seed)
    fresh = _synth_rows(n, fresh_seed)
    for i, r in enumerate(synth):
        rows.append((r["image_id"], bytes(r["bytes"]), r["caption"]))
    for i, r in enumerate(synth):
        if i % 4 == 0:
            try:
                px = decode_image(bytes(r["bytes"]))
                data = encode_image(px, "jpeg", quality=quality)
            except (ValueError, NotImplementedError):
                continue
            rid = r["image_id"] + "_re"
            cap = "re-hosted copy " + rid.translate(
                str.maketrans("0123456789", "abcdefghij")
            )
            rows.append((rid, data, cap))
    for i, r in enumerate(synth):
        if i % 6 == 0:
            rows.append((
                "zz_" + r["image_id"], bytes(fresh[i]["bytes"]), r["caption"]
            ))

    parent = {rid: rid for rid, _, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_caption: dict = {}
    for rid, _, cap in rows:
        key = hashlib.md5(normalize_text(cap).encode("utf-8")).hexdigest()
        by_caption.setdefault(key, []).append(rid)
    for members in by_caption.values():
        for m in members[1:]:
            union(members[0], m)

    hashes = []
    for rid, data, _ in rows:
        try:
            hashes.append((rid, phash64(decode_image(data))))
        except (ValueError, NotImplementedError):
            continue
    buckets: dict = {}
    for rid, ph in hashes:
        for c in range(8):
            buckets.setdefault((c, (ph >> (8 * c)) & 0xFF), 0)
            buckets[(c, (ph >> (8 * c)) & 0xFF)] += 1
    assert max(buckets.values()) <= 2048, "fixture bucket exceeds LSH cap"
    mask64 = (1 << 64) - 1
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            (xa, pa), (xb, pb) = hashes[i], hashes[j]
            if bin((pa ^ pb) & mask64).count("1") <= max_hamming:
                union(xa, xb)

    # find() compresses to the min id because union always hooks the
    # larger root under the smaller — matching connected_components.
    out = []
    for rid, _, _ in rows:
        cluster = find(rid)
        out.append((rid, cluster, rid == cluster))
    return _values_sql(
        out,
        ["image_id", "cluster_id", "is_survivor"],
        ["VARCHAR", "VARCHAR", "BOOLEAN"],
    )


def webdataset_shards_sql(n: int = 120, seed: int = 42,
                          num_shards: int = 8) -> str:
    """Pure twin of q_webdataset_shards: same shard hash, same in-shard
    order, same ustar codec — md5 equality proves byte-exact archives."""
    import hashlib

    from .sources.webdataset import build_shard_tar, shard_of

    by_shard: dict = {}
    for r in _synth_rows(n, seed):
        row = {
            "image_id": r["image_id"], "bytes": bytes(r["bytes"]),
            "caption": r["caption"], "fmt": r["fmt"],
            "w": r["w"], "h": r["h"],
        }
        by_shard.setdefault(shard_of(r["image_id"], num_shards), []).append(row)
    rows = []
    for sid in sorted(by_shard):
        data = build_shard_tar(by_shard[sid])
        rows.append((sid, len(by_shard[sid]), len(data),
                     hashlib.md5(data).hexdigest()))
    return _values_sql(
        rows,
        ["shard_id", "n_samples", "tar_len", "tar_md5"],
        ["BIGINT", "BIGINT", "BIGINT", "VARCHAR"],
    )


def minhash_sql(sf_dir: str, num_hashes: int = 32, shingle_k: int = 5,
                seed: int = 7) -> str:
    """One row per doc, one scalar column per hash (h00..h31) — mirrors
    q_minhash_signatures' fan-out-free projection."""
    from .operators.dedup import _minhash_params, minhash_sig

    a, b = _minhash_params(num_hashes, seed)
    rows = [
        (d, *minhash_sig(t, a, b, num_hashes, shingle_k))
        for d, t in _read_docs(sf_dir)
    ]
    cols = ["doc_id"] + [f"h{i:02d}" for i in range(num_hashes)]
    return _values_sql(rows, cols, ["BIGINT"] * (num_hashes + 1))


# ---------------------------------------------------------------------------
# embedding oracles (SRP-LSH / IVF ANN) — numpy math identical to the UDFs
# ---------------------------------------------------------------------------

def _srp_sigs(mat: np.ndarray, planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pl = rng.standard_normal((mat.shape[1], planes))
    bits = (mat @ pl) > 0
    return (bits.astype(np.int64) << np.arange(planes, dtype=np.int64)).sum(axis=1)


def ann_lsh_sql(sf_dir: str, k: int = 10, planes: int = 16, max_flip: int = 6,
                seed: int = 31) -> str:
    emb = _read_embeddings(sf_dir)
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in emb])
    query = list(mat[ids.tolist().index(0)])
    sigs = _srp_sigs(mat, planes, seed)
    qsig = _srp_sigs(np.asarray([query]), planes, seed)[0]
    qnorm = float(np.sqrt(np.dot(query, query)))
    cand = [
        i for i in range(len(ids))
        if bin(int(sigs[i]) ^ int(qsig)).count("1") <= max_flip
    ]
    # order on the UNROUNDED cosine (Spark's orderBy runs before the
    # final round(...) projection), round only for emission
    scored = [
        (int(ids[i]), _fold_dot(mat[i], query) / (_fold_norm(mat[i]) * qnorm))
        for i in cand
    ]
    scored.sort(key=lambda r: (-r[1], r[0]))
    rows = [(i, _round_like_spark(c)) for i, c in scored[:k]]
    return _values_sql(rows, ["vec_id", "cos_sim"], ["BIGINT", "DOUBLE"])


def _twin_centroids(sf_dir: str, kc: int = 8, iters: int = 8):
    """train_ivf_centroids' exact math on the same vec_id-ordered
    sample (numpy only, same seed path). Returns (centroids, [(id,
    vector), ...])."""
    emb = _read_embeddings(sf_dir)
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in emb])
    x = mat[np.argsort(ids, kind="stable")][:2048]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(17)
    cent = x[rng.choice(len(x), size=min(kc, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent, [(int(i), v) for i, v in zip(ids, mat)]


def embedding_prototypes_sql(sf_dir: str) -> str:
    """q_embedding_prototypes expected output via the pure twin
    (operators/prototypes.prototypicality_rows) on the twin-trained
    codebook."""
    from .operators.prototypes import prototypicality_rows

    cent, vecs = _twin_centroids(sf_dir)
    rows = prototypicality_rows(vecs, cent, drop_frac=0.1)
    return _values_sql(
        rows,
        ["vec_id", "ivf_cluster", "proto_micro", "is_prototype"],
        ["BIGINT", "BIGINT", "BIGINT", "BOOLEAN"],
    )


def ann_ivf_sql(sf_dir: str, k: int = 10, kc: int = 8, iters: int = 8,
                nprobe: int = 4) -> str:
    # train_ivf_centroids takes a Spark df; replicate its exact math on
    # the same vec_id-ordered sample (numpy only, same seed path).
    emb = _read_embeddings(sf_dir)
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in emb])
    x = mat[np.argsort(ids, kind="stable")][:2048]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(17)
    cent = x[rng.choice(len(x), size=min(kc, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    query = list(mat[ids.tolist().index(0)])
    q = np.asarray(query) / np.linalg.norm(query)
    probes = set(np.argsort(-(cent @ q))[:nprobe].tolist())
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign_all = np.argmax(unit @ cent.T, axis=1)
    qnorm = float(np.linalg.norm(query))
    scored = [
        (int(ids[i]), _fold_dot(mat[i], query) / (_fold_norm(mat[i]) * qnorm))
        for i in range(len(ids))
        if int(assign_all[i]) in probes
    ]
    scored.sort(key=lambda r: (-r[1], r[0]))
    rows = [(i, _round_like_spark(c)) for i, c in scored[:k]]
    return _values_sql(rows, ["vec_id", "cos_sim"], ["BIGINT", "DOUBLE"])


def ann_batch_sql(sf_dir: str, n_queries: int = 5, k: int = 5) -> str:
    """q_ann_batch expected rows: loop-accumulated cosines (the same
    component-order arithmetic the partition UDF uses — deliberately not
    BLAS matmul) for the first n_queries embedding vectors, top-k per
    query with (-cos, vec_id) ordering."""
    emb = _read_embeddings(sf_dir)
    ids = [int(r[0]) for r in emb]
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in emb])
    order = np.argsort(ids, kind="stable")
    qm = mat[order[:n_queries]]
    qn = np.sqrt((qm * qm).sum(axis=1))
    dim = mat.shape[1]
    acc = np.zeros((len(ids), n_queries))
    for c in range(dim):
        acc += mat[:, c][:, None] * qm[None, :, c]
    vn = np.zeros(len(ids))
    for c in range(dim):
        vn += mat[:, c] * mat[:, c]
    cos = acc / (np.sqrt(vn)[:, None] * qn[None, :])
    rows = []
    for qi in range(n_queries):
        scored = sorted(
            ((ids[i], cos[i, qi]) for i in range(len(ids))),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        for rank, (vid, cs) in enumerate(scored, 1):
            rows.append((qi, vid, _round_like_spark(cs), rank))
    return _values_sql(
        rows, ["query_idx", "vec_id", "cos_sim", "rank"],
        ["INT", "BIGINT", "DOUBLE", "INT"],
    )


def emb_near_pairs_lsh_sql(sf_dir: str, threshold: float = 0.85,
                           planes: int = 64, chunks: int = 8,
                           seed: int = 31) -> str:
    emb = _read_embeddings(sf_dir)
    ids = [int(r[0]) for r in emb]
    vecs = [np.asarray(r[1], dtype=np.float64) for r in emb]
    # _emb_with_neardups: copies of vec_id % 10 == 0 with +0.5 on comp 0
    all_ids, all_vecs = list(ids), list(vecs)
    for i, vid in enumerate(ids):
        if vid % 10 == 0:
            v = vecs[i].copy()
            v[0] += 0.5
            all_ids.append(vid + 1_000_000)
            all_vecs.append(v)
    mat = np.stack(all_vecs)
    sigs = _srp_sigs(mat, planes, seed)
    bits_per = planes // chunks
    mask = (1 << bits_per) - 1
    norms = [_fold_norm(v) for v in all_vecs]
    buckets: dict = {}
    for i in range(len(all_ids)):
        if norms[i] <= 0:
            continue
        for c in range(chunks):
            key = (c, (int(sigs[i]) >> (bits_per * c)) & mask)
            buckets.setdefault(key, []).append(i)
    pairs = {}
    for members in buckets.values():
        assert len(members) <= 2048, "fixture bucket exceeds LSH cap"
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = members[ai], members[bi]
                ia, ib = all_ids[x], all_ids[y]
                if ia > ib:
                    ia, ib, x, y = ib, ia, y, x
                if (ia, ib) in pairs:
                    continue
                cos = _fold_dot(all_vecs[x], all_vecs[y]) / (norms[x] * norms[y])
                if cos >= threshold:
                    pairs[(ia, ib)] = _round_like_spark(cos)
    rows = [(a, b, c) for (a, b), c in sorted(pairs.items())]
    return _values_sql(rows, ["id_a", "id_b", "cos_sim"],
                       ["BIGINT", "BIGINT", "DOUBLE"])


def quality_full_sql(sf_dir: str, pii_clauses: Sequence[str]) -> str:
    """q_quality_full expected output via the pure-Python rule mirror
    (core/quality.drop_reasons) that tests already pin row-equal to the
    JVM-native rule columns, plus the same langid/perplexity models the
    UDF calls."""
    from .core.langid import detect_language
    from .core.perplexity import perplexity
    from .core.quality import drop_reasons

    rows = []
    for d, t in _read_docs(sf_dir):
        caption = t + pii_clauses[d % len(pii_clauses)]
        lang = detect_language(caption)
        ppl = perplexity(caption)
        keep = not drop_reasons(caption, lang=lang, ppl=ppl)
        rows.append((d, keep, lang, _round_like_spark(ppl)))
    return _values_sql(
        rows,
        ["doc_id", "keep", "lang_detected", "ppl"],
        ["BIGINT", "BOOLEAN", "VARCHAR", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# LSH pair oracles — bucket EQUALITY replicates the grouping without
# Spark's xxhash64 (equal bucket hash <=> equal banded signature slice /
# chunk value, modulo ~2^-64 collisions)
# ---------------------------------------------------------------------------

def _minhash_pairs(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                   shingle_k: int = 5, threshold: float = 0.5,
                   seed: int = 7):
    """(pairs dict, all doc ids) — shared by the pairs and cluster oracles."""
    from .operators.dedup import _minhash_params, minhash_sig

    a, b = _minhash_params(num_hashes, seed)
    docs = list(_read_docs(sf_dir))
    # q_minhash_lsh_pairs unions perturbed copies; the .where runs AFTER
    # the doc_id rename, so the filter applies to the SHIFTED id
    all_docs = docs + [
        (d + 1_000_000, t + " extra trailing tokens here")
        for d, t in docs
        if (d + 1_000_000) % 7 == 0
    ]
    # Spark drops rows with trim(text) == '' BEFORE the signature UDF
    # (space-trim, mirroring F.trim); mirror exactly.
    all_docs = [
        (d, t) for d, t in all_docs
        if t is not None and t.strip(" ") != ""
    ]
    sigs = {d: minhash_sig(t, a, b, num_hashes, shingle_k) for d, t in all_docs}
    rpb = num_hashes // bands
    buckets: dict = {}
    for d, s in sigs.items():
        for bnd in range(bands):
            buckets.setdefault(
                (bnd, tuple(s[bnd * rpb:(bnd + 1) * rpb])), []
            ).append(d)
    pairs: dict = {}
    for members in buckets.values():
        # Spark reroutes buckets above DEFAULT_MAX_BUCKET to a star
        # expansion this quadratic oracle does not model; the fixture
        # corpus must stay under the cap (degrades to rows-only if not).
        assert len(members) <= 2048, "fixture bucket exceeds LSH cap"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                ia, ib = (x, y) if x < y else (y, x)
                if (ia, ib) in pairs:
                    continue
                est = sum(
                    1 for p, q in zip(sigs[x], sigs[y]) if p == q
                ) / num_hashes
                if est >= threshold:
                    pairs[(ia, ib)] = _round_like_spark(est)
    return pairs, [d for d, _ in all_docs]


def lsh_bucket_stats_sql(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                         shingle_k: int = 5, seed: int = 7) -> str:
    """Bucket-size histogram of the minhash banding over the plain
    documents table — banding replicated by slice equality (equal slices
    <=> equal xxhash64 band keys, modulo ~2^-64 collisions)."""
    from .operators.dedup import _minhash_params, minhash_sig

    a, b = _minhash_params(num_hashes, seed)
    rpb = num_hashes // bands
    buckets: dict = {}
    for d, t in _read_docs(sf_dir):
        if t is None or t.strip(" ") == "":  # mirrors Spark's trim filter
            continue
        s = minhash_sig(t, a, b, num_hashes, shingle_k)
        for bnd in range(bands):
            key = (bnd, tuple(s[bnd * rpb:(bnd + 1) * rpb]))
            buckets[key] = buckets.get(key, 0) + 1
    hist: dict = {}
    for size in buckets.values():
        hist[size] = hist.get(size, 0) + 1
    rows = sorted(
        (size, n, n * (size * (size - 1) // 2)) for size, n in hist.items()
    )
    return _values_sql(
        rows, ["bucket_size", "n_buckets", "candidate_pairs"],
        ["BIGINT", "BIGINT", "BIGINT"],
    )


def minhash_lsh_pairs_sql(sf_dir: str) -> str:
    pairs, _ = _minhash_pairs(sf_dir)
    rows = [(x, y, e) for (x, y), e in sorted(pairs.items())]
    return _values_sql(rows, ["id_a", "id_b", "est_jaccard"],
                       ["BIGINT", "BIGINT", "DOUBLE"])


def dedup_clusters_sql(sf_dir: str) -> str:
    """Union-find over the replicated minhash pairs → cluster labels.

    An INDEPENDENT transitive closure (path-compressed union-find) of
    the same pair graph the Spark side closes with iterative min-label
    propagation — the strongest cross-check an iterative distributed
    algorithm can get."""
    pairs, all_ids = _minhash_pairs(sf_dir)
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (x, y) in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    # representative = min id per component: union by min above keeps
    # the root minimal, but verify via a second pass for safety
    comp_min: dict = {}
    for i in all_ids:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    rows = sorted(
        (i, comp_min[find(i)], i == comp_min[find(i)]) for i in all_ids
    )
    return _values_sql(
        rows, ["doc_id", "cluster_id", "is_survivor"],
        ["BIGINT", "BIGINT", "BOOLEAN"],
    )


def dedup_best_sql(sf_dir: str) -> str:
    """q_dedup_best expected output: union-find closure of the same pair
    graph, then argmax(len(text)) survivor per cluster (min-id ties)."""
    pairs, all_ids = _minhash_pairs(sf_dir)
    docs = list(_read_docs(sf_dir))
    all_docs = docs + [
        (d + 1_000_000, t + " extra trailing tokens here")
        for d, t in docs
        if (d + 1_000_000) % 7 == 0
    ]
    length = {d: len(t or "") for d, t in all_docs}
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (x, y) in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comp_min: dict = {}
    for i in all_ids:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    winners: dict = {}
    for i in all_ids:
        c = comp_min[find(i)]
        cur = winners.get(c)
        if cur is None or (length[i], -i) > (length[cur], -cur):
            winners[c] = i
    rows = sorted(
        (i, comp_min[find(i)], length[i], winners[comp_min[find(i)]] == i)
        for i in all_ids
    )
    return _values_sql(
        rows,
        ["doc_id", "cluster_id", "score", "is_survivor"],
        ["BIGINT", "BIGINT", "INTEGER", "BOOLEAN"],
    )


def simhash_near_pairs_sql(sf_dir: str, max_hamming: int = 6) -> str:
    from .operators.dedup import simhash64

    docs = list(_read_docs(sf_dir))
    all_docs = docs + [
        (d + 1_000_000, t + " zz")
        for d, t in docs
        if (d + 1_000_000) % 11 == 0
    ]
    all_docs = [
        (d, t) for d, t in all_docs
        if t is not None and t.strip(" ") != ""  # mirrors Spark's trim filter
    ]
    sh = {d: simhash64(t) for d, t in all_docs}
    mask64 = (1 << 64) - 1
    buckets: dict = {}
    for d, s in sh.items():
        for c in range(4):
            buckets.setdefault((c, (s >> (16 * c)) & 0xFFFF), []).append(d)
    pairs: dict = {}
    for members in buckets.values():
        assert len(members) <= 2048, "fixture bucket exceeds LSH cap"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                ia, ib = (x, y) if x < y else (y, x)
                if (ia, ib) in pairs:
                    continue
                ham = bin((sh[x] ^ sh[y]) & mask64).count("1")
                if ham <= max_hamming:
                    pairs[(ia, ib)] = ham
    rows = [(x, y, h) for (x, y), h in sorted(pairs.items())]
    return _values_sql(rows, ["id_a", "id_b", "hamming"],
                       ["BIGINT", "BIGINT", "INT"])


# ---------------------------------------------------------------------------
# synthetic image-table oracles — gen_row(seed, idx) is pure per-row, so
# every multimodal query is replicable by calling the same per-row
# functions the mapInPandas stages call
# ---------------------------------------------------------------------------

def _synth_rows(n: int, seed: int = 42):
    from .sources.synth import gen_row

    return [gen_row(seed, i) for i in range(n)]


def image_verify_sql(n: int = 300, seed: int = 42) -> str:
    from .images import decode_image, psnr
    from .images.codecs import encode_image
    from .sources.synth import LOSSY_QUALITY

    rows = []
    for r in _synth_rows(n, seed):
        ok = dims = False
        mean = q = float("nan")
        try:
            px = decode_image(bytes(r["bytes"]))
            ok = True
            dims = px.shape[0] == r["h"] and px.shape[1] == r["w"]
            mean = float(px.mean())
            second = decode_image(
                encode_image(px, r["fmt"], quality=LOSSY_QUALITY)
            )
            p = psnr(px, second)
            q = 999.0 if math.isinf(p) else p
        except (ValueError, NotImplementedError):
            pass
        rows.append((
            r["image_id"], ok, dims,
            _round_like_spark(mean, 2),
            (not math.isnan(q)) and q >= 40.0,
        ))
    return _values_sql(
        rows, ["image_id", "decode_ok", "dims_ok", "px_mean", "psnr_ok"],
        ["VARCHAR", "BOOLEAN", "BOOLEAN", "DOUBLE", "BOOLEAN"],
    )


def image_resize_sql(n: int = 200, seed: int = 42) -> str:
    """q_image_resize_export expected output: bucket dims + re-encoded
    length/md5 through the same pure resize_export_row (decode -> exact
    area resample -> real JPEG encode)."""
    from .operators.image_stage import resize_export_row
    from .sources.synth import LOSSY_QUALITY

    from __spark_entry__ import _RESIZE_BUCKETS

    rows = []
    for r in _synth_rows(n, seed):
        bw, bh, ln, md5, _ = resize_export_row(
            bytes(r["bytes"]), _RESIZE_BUCKETS, LOSSY_QUALITY
        )
        rows.append((r["image_id"], bw, bh, ln, md5))
    return _values_sql(
        rows,
        ["image_id", "bucket_w", "bucket_h", "out_len", "out_md5"],
        ["VARCHAR", "INTEGER", "INTEGER", "BIGINT", "VARCHAR"],
    )


def image_features_sql(n: int = 200, seed: int = 42) -> str:
    from .images import decode_image

    rows = []
    for r in _synth_rows(n, seed):
        try:
            px = decode_image(bytes(r["bytes"])).astype(np.float64)
        except (ValueError, NotImplementedError):
            rows.append((r["image_id"], None, None, None))
            continue
        gray = px.mean(axis=2)
        rows.append((
            r["image_id"],
            _round_like_spark(float(px[:, :, 0].mean()), 2),
            _round_like_spark(float(px[:, :, 1].mean()), 2),
            _round_like_spark(float(gray.std()), 2),
        ))
    return _values_sql(
        rows, ["image_id", "mean_r", "mean_g", "std_gray"],
        ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE"],
    )


def clip_alignment_sql(n: int = 300, seed: int = 42) -> str:
    """q_clip_alignment expected output via operators.alignment's
    pure-Python row twin (same decode, same stand-in encoders, same
    left-to-right fold dot, same HALF_UP rounding)."""
    from .operators.alignment import STUB_THRESHOLD, alignment_row

    rows = []
    for r in _synth_rows(n, seed):
        image_id, sim, keep = alignment_row(r, threshold=STUB_THRESHOLD)
        rows.append(
            (image_id, None if sim is None else _round_like_spark(sim), keep)
        )
    return _values_sql(
        rows,
        ["image_id", "clip_sim", "keep"],
        ["VARCHAR", "DOUBLE", "BOOLEAN"],
    )


def image_metadata_sql(n: int = 300, seed: int = 42) -> str:
    """Re-derive the image_metadata_scrub query end-to-end: same synth
    rows, same deterministic injection, same scrub_row pure function —
    so the value hash checks chunk walking, text extraction, the PII
    stack on metadata text, and the md5 of the stripped file."""
    from .operators.image_metadata import inject_fixture_metadata, scrub_row

    rows = []
    for i, r in enumerate(_synth_rows(n, seed)):
        data = inject_fixture_metadata(bytes(r["bytes"]), i)
        rows.append((r["image_id"], *scrub_row(data)))
    return _values_sql(
        rows,
        ["image_id", "is_png", "meta_chunks", "meta_fields", "meta_pii",
         "meta_toxic", "bytes_removed", "clean_md5"],
        ["VARCHAR", "BOOLEAN", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
         "BIGINT", "VARCHAR"],
    )


def corpus_lm_sql(sf_dir: str) -> str:
    """q_corpus_lm_perplexity expected output: (doc_id, n_grams,
    nll_micronats) through the pure-Python twin of the distributed
    trainer (same trigrams, counting, top-K tie-break, micro-nat
    quantization)."""
    from .operators.corpus_lm import corpus_lm_rows

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    rows = corpus_lm_rows(docs)
    return _values_sql(
        rows,
        ["doc_id", "n_grams", "nll_micronats"],
        ["BIGINT", "BIGINT", "BIGINT"],
    )


def refinedweb_sql(sf_dir: str) -> str:
    """q_refinedweb_pipeline expected output. The html hop is
    re-derived through the DuckDB strip chain (the proven-parity path —
    python `re` has unicode-\\s semantics Java/RE2 lack, so the SQL
    renderer is the safe twin); every later hop runs the pure Python
    twins (line_clean_rows, detect_language, ASCII word split, md5,
    min-id survivor among keeps)."""
    import hashlib
    import re as _re

    from __spark_entry__ import synth_page_py

    from .core.langid import detect_language
    from .operators.html_extract import strip_html_sql
    from .operators.line_clean import line_clean_rows

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.execute("CREATE TABLE pages (doc_id BIGINT, html VARCHAR)")
    con.executemany(
        "INSERT INTO pages VALUES (?, ?)",
        [(d, synth_page_py(d, t or "")) for d, t in docs],
    )
    extracted = con.execute(
        f"SELECT doc_id, {strip_html_sql('html')} FROM pages ORDER BY doc_id"
    ).fetchall()
    con.close()

    cleaned = line_clean_rows(extracted)
    ws = _re.compile(r"[ \t\n\x0B\f\r]+")
    rows = []
    for d, n_lines, _, _, doc_keep, text_clean in cleaned:
        lang = detect_language(text_clean)
        wc = len(ws.split(text_clean.strip()))
        fp = hashlib.md5(text_clean.encode("utf-8")).hexdigest()
        keep = bool(doc_keep and 3 <= wc <= 256 and lang != "und")
        rows.append([d, lang, n_lines, doc_keep, wc, len(text_clean),
                     keep, fp])
    min_keep: dict = {}
    for r in rows:
        if r[6]:
            min_keep[r[7]] = min(min_keep.get(r[7], r[0]), r[0])
    out = [
        (r[0], r[1], r[2], r[3], r[4], r[5], r[6],
         bool(r[6] and min_keep.get(r[7]) == r[0]))
        for r in rows
    ]
    return _values_sql(
        out,
        ["doc_id", "lang", "n_lines", "doc_keep", "wc", "n_chars_clean",
         "keep", "is_survivor"],
        ["BIGINT", "VARCHAR", "INTEGER", "BOOLEAN", "INTEGER", "INTEGER",
         "BOOLEAN", "BOOLEAN"],
    )


def moore_lewis_sql(sf_dir: str) -> str:
    """q_moore_lewis expected output via the pure twin
    (operators/corpus_lm.moore_lewis_rows), src0 as the in-domain
    slice."""
    from .operators.corpus_lm import moore_lewis_rows

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    texts = [(d, t) for d, _, t in docs]
    in_ids = {d for d, s, _ in docs if s == "src0"}
    rows = moore_lewis_rows(texts, in_ids)
    return _values_sql(
        rows,
        ["doc_id", "n_grams", "delta_micronats", "avg_delta_micro"],
        ["BIGINT", "BIGINT", "BIGINT", "BIGINT"],
    )


def jpeg_exif_scrub_sql(n: int = 300, seed: int = 42) -> str:
    """Re-derive the jpeg_exif_scrub query end-to-end: same synth rows,
    same deterministic EXIF/COM/GPS injection, same scrub_jpeg_row pure
    function — the value hash checks marker walking, TIFF IFD parsing,
    the PII stack on metadata text, GPS detection, and the md5 of the
    losslessly stripped file."""
    from .operators.image_metadata import (
        inject_jpeg_fixture_metadata,
        scrub_jpeg_row,
    )

    rows = []
    for i, r in enumerate(_synth_rows(n, seed)):
        data = inject_jpeg_fixture_metadata(bytes(r["bytes"]), i)
        rows.append((r["image_id"], *scrub_jpeg_row(data)))
    return _values_sql(
        rows,
        ["image_id", "is_jpeg", "meta_segments", "meta_fields", "meta_pii",
         "meta_toxic", "has_gps", "bytes_removed", "clean_md5"],
        ["VARCHAR", "BOOLEAN", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
         "BOOLEAN", "BIGINT", "VARCHAR"],
    )


def image_quality_sql(n: int = 400, seed: int = 42) -> str:
    from .operators.image_quality import image_quality_row

    rows = [
        image_quality_row(
            r["image_id"], r["w"], r["h"], r["fmt"], len(r["bytes"])
        )
        for r in _synth_rows(n, seed)
    ]
    return _values_sql(
        rows,
        ["image_id", "w", "h", "fmt", "aspect", "bytes_per_px",
         "size_ok", "aspect_ok", "density_ok", "fmt_ok", "keep"],
        ["VARCHAR", "INTEGER", "INTEGER", "VARCHAR", "DOUBLE", "DOUBLE",
         "BOOLEAN", "BOOLEAN", "BOOLEAN", "BOOLEAN", "BOOLEAN"],
    )


def export_prep_sql(n: int = 400, seed: int = 42, num_shards: int = 8) -> str:
    """Fixture oracle for export_prep: the pure-Python twin recomputes
    the quantized log-aspect argmin, the md5 shard hash, and the
    (md5, id)-ordered position for the same synthetic corpus."""
    from .operators.export_prep import export_prep_rows

    rows = export_prep_rows(_synth_rows(n, seed), num_shards=num_shards)
    return _values_sql(
        rows,
        ["image_id", "w", "h", "bucket_idx", "bucket_w", "bucket_h",
         "shard_id", "pos_in_shard"],
        ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
         "BIGINT", "INTEGER"],
    )


def video_frame_sample_sql(n: int = 100, seed: int = 42,
                           every_n: int = 2) -> str:
    from .video.avi import decode_avi_mjpeg, encode_avi_mjpeg, synth_clip

    rows = []
    for i in range(n):
        clip = encode_avi_mjpeg(synth_clip(i), fps=10, quality=90)
        _, frames = decode_avi_mjpeg(clip)
        for idx, px in enumerate(frames):
            if idx % every_n:
                continue
            rows.append((
                f"vid_{i:06d}", idx, px.shape[1], px.shape[0],
                _round_like_spark(float(px.mean()), 2),
            ))
    return _values_sql(
        rows,
        ["video_id", "frame_idx", "frame_w", "frame_h", "frame_gray_mean"],
        ["VARCHAR", "INT", "INT", "INT", "DOUBLE"],
    )


def audio_features_sql(n: int = 150, seed: int = 42) -> str:
    from .audio.wav import decode_wav, encode_wav, synth_tone

    rows = []
    for i in range(n):
        sr, pcm = decode_wav(encode_wav(synth_tone(i)))
        ns = len(pcm)
        zc = float(np.mean(np.abs(np.diff(np.signbit(pcm))))) if ns > 1 else 0.0
        rms = float(np.sqrt(np.mean(pcm ** 2))) if ns else 0.0
        rows.append((
            f"aud_{i:06d}", sr, ns,
            _round_like_spark(rms), _round_like_spark(zc),
        ))
    return _values_sql(
        rows, ["audio_id", "sample_rate", "n_samples", "rms", "zcr"],
        ["VARCHAR", "INT", "BIGINT", "DOUBLE", "DOUBLE"],
    )


def phash_near_pairs_sql(n: int = 400, seed: int = 42,
                         max_hamming: int = 3) -> str:
    """q_phash_near_pairs expected pairs: synth rows ∪ 2-bit-flipped
    copies of idx%5==0, banded into 4x16-bit chunks, hamming verify —
    same set semantics as the Spark operator's first-chunk-once
    emission."""
    mask64 = (1 << 64) - 1
    rows = [(r["image_id"], r["phash"]) for r in _synth_rows(n, seed)]
    rows += [
        (rid + "_re", ph ^ 5)
        for i, (rid, ph) in enumerate(list(rows))
        if i % 5 == 0
    ]
    buckets: dict = {}
    for rid, ph in rows:
        for c in range(4):
            buckets.setdefault((c, (ph >> (16 * c)) & 0xFFFF), []).append(
                (rid, ph)
            )
    pairs: dict = {}
    for members in buckets.values():
        assert len(members) <= 2048, "fixture bucket exceeds LSH cap"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (xa, pa), (xb, pb) = members[i], members[j]
                ia, ib = (xa, xb) if xa < xb else (xb, xa)
                if (ia, ib) in pairs:
                    continue
                ham = bin((pa ^ pb) & mask64).count("1")
                if ham <= max_hamming:
                    pairs[(ia, ib)] = ham
    out = [(a, b, h) for (a, b), h in sorted(pairs.items())]
    return _values_sql(out, ["id_a", "id_b", "hamming"],
                       ["VARCHAR", "VARCHAR", "INT"])


def _banded_pairs(rows, max_hamming: int, chunks: int = 8):
    """The banded hamming operator's chunk-bucket pairing as ONE pure
    twin shared by every 64-bit locality-hash fixture (pixel pHash,
    audio fingerprint, video middle-frame pHash): (id, hash) rows ->
    sorted (id_a, id_b, hamming) among pairs sharing >= 1 chunk value.
    Asserts bucket sizes stay under the operator's cap so the exact
    quadratic-branch semantics hold."""
    mask64 = (1 << 64) - 1
    width = 64 // chunks
    cmask = (1 << width) - 1
    buckets: dict = {}
    for rid, hv in rows:
        for c in range(chunks):
            buckets.setdefault((c, (hv >> (width * c)) & cmask), []).append(
                (rid, hv)
            )
    pairs: dict = {}
    for members in buckets.values():
        assert len(members) <= 2048, "fixture bucket exceeds LSH cap"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (xa, pa), (xb, pb) = members[i], members[j]
                ia, ib = (xa, xb) if xa < xb else (xb, xa)
                if (ia, ib) in pairs:
                    continue
                ham = bin((pa ^ pb) & mask64).count("1")
                if ham <= max_hamming:
                    pairs[(ia, ib)] = ham
    return [(a, b, h) for (a, b), h in sorted(pairs.items())]


def audio_near_pairs_sql(n: int = 200, max_hamming: int = 7,
                         chunks: int = 8) -> str:
    """q_audio_near_pairs expected pairs: same synth/encode/decode/
    fingerprint chain, then the chunks x (64/chunks)-bit bucket pairing
    the banded operator performs."""
    from .audio.fingerprint import audio_fp64
    from .audio.wav import decode_wav, encode_wav, synth_tone

    rows = []
    for i in range(n):
        x = synth_tone(i)
        sr, dec = decode_wav(encode_wav(x))
        rows.append((f"aud_{i:06d}", audio_fp64(dec, sr)))
        if i % 5 == 0:
            rng = np.random.default_rng((77, i))
            noisy = np.clip(
                0.95 * x + 0.01 * rng.standard_normal(len(x)), -1.0, 1.0
            )
            sr2, dec2 = decode_wav(encode_wav(noisy))
            rows.append((f"aud_{i:06d}_re", audio_fp64(dec2, sr2)))
    out = _banded_pairs(rows, max_hamming, chunks)
    return _values_sql(out, ["id_a", "id_b", "hamming"],
                       ["VARCHAR", "VARCHAR", "INT"])


def video_near_dup_sql(n: int = 100, max_hamming: int = 7,
                       chunks: int = 8) -> str:
    """q_video_near_dup expected pairs: same synth/encode/decode/
    middle-frame-pHash chain, same chunk-bucket pairing."""
    from .images.phash import phash64
    from .video.avi import decode_avi_mjpeg, encode_avi_mjpeg, synth_clip

    rows = []
    for i in range(n):
        frames = synth_clip(i)

        def fp(quality):
            data = encode_avi_mjpeg(frames, fps=10, quality=quality)
            decoded = decode_avi_mjpeg(data)[1]
            return phash64(decoded[len(decoded) // 2])

        rows.append((f"vid_{i:06d}", fp(90)))
        if i % 4 == 0:
            rows.append((f"vid_{i:06d}_re", fp(70)))
    out = _banded_pairs(rows, max_hamming, chunks)
    return _values_sql(out, ["id_a", "id_b", "hamming"],
                       ["VARCHAR", "VARCHAR", "INT"])


def pixel_phash_pairs_sql(
    n: int = 120,
    seed: int = 42,
    quality: int = 90,
    max_hamming: int = 16,
) -> str:
    """q_pixel_phash_pairs expected pairs: pHash from decoded pixels of
    the synth rows ∪ q90 re-encodes of idx%4==0, then the SAME 4x16-bit
    chunk-bucket pairing the banded operator performs."""
    from .images import decode_image
    from .images.codecs import encode_image
    from .images.phash import phash64

    rows = []
    for i, r in enumerate(_synth_rows(n, seed)):
        px = decode_image(bytes(r["bytes"]))
        rows.append((r["image_id"], phash64(px)))
        if i % 4 == 0:
            vpx = decode_image(encode_image(px, "jpeg", quality=quality))
            rows.append((r["image_id"] + "_re", phash64(vpx)))
    out = _banded_pairs(rows, max_hamming, chunks=8)
    return _values_sql(out, ["id_a", "id_b", "hamming"],
                       ["VARCHAR", "VARCHAR", "INT"])


def multimodal_curation_sql(n: int = 400, seed: int = 42) -> str:
    """q_multimodal_curation expected output: per-row composition of the
    SAME pure twins (image_quality_row keep, alignment fold-dot, pHash)
    plus a dict min-id survivor over synth rows ∪ 'zz_'-prefixed exact
    copies of idx%6==0."""
    from .images import decode_image
    from .images.phash import phash64
    from .operators.alignment import caption_embedding, image_embedding
    from .operators.image_quality import image_quality_row

    recs = []
    for i, r in enumerate(_synth_rows(n, seed)):
        recs.append((r["image_id"], r))
        if i % 6 == 0:
            recs.append(("zz_" + r["image_id"], r))

    staged = []
    winners: dict = {}
    for rid, r in recs:
        quality = image_quality_row(
            rid, r["w"], r["h"], r["fmt"], len(r["bytes"])
        )[10]
        try:
            px = decode_image(bytes(r["bytes"]))
            ie = image_embedding(px)
            ph = phash64(px)
        except (ValueError, NotImplementedError):
            ie = ph = None
        te = caption_embedding(r["caption"])
        from .operators.alignment import STUB_THRESHOLD

        if ie is None:
            sim, align = None, False
        else:
            acc = 0.0
            for a, b in zip(ie.tolist(), te.tolist()):
                acc += a * b
            sim, align = acc, acc >= STUB_THRESHOLD
        staged.append((rid, quality, align, sim, ph))
        if ph is not None and (ph not in winners or rid < winners[ph]):
            winners[ph] = rid
    rows = [
        (
            rid,
            quality,
            align,
            None if sim is None else _round_like_spark(sim),
            ph is not None and winners[ph] == rid,
            bool(
                quality and align and ph is not None and winners[ph] == rid
            ),
        )
        for rid, quality, align, sim, ph in staged
    ]
    return _values_sql(
        rows,
        ["image_id", "quality_ok", "align_ok", "clip_sim", "is_survivor",
         "keep"],
        ["VARCHAR", "BOOLEAN", "BOOLEAN", "DOUBLE", "BOOLEAN", "BOOLEAN"],
    )


def phash_dedup_sql(n: int = 400, seed: int = 42) -> str:
    winners: dict = {}
    for r in _synth_rows(n, seed):
        cur = winners.get(r["phash"])
        if cur is None or r["image_id"] < cur:
            winners[r["phash"]] = r["image_id"]
    rows = sorted((img, ph) for ph, img in winners.items())
    return _values_sql(rows, ["image_id", "phash"], ["VARCHAR", "BIGINT"])


def quality_classifier_sql(sf_dir: str, sample: int = 512) -> str:
    """Retrains + rescores through the operator's own pure functions —
    an executor-free re-derivation of the learned stage (training is
    deterministic: zeros init, fixed epochs, id-ordered accumulation),
    so every q_prob double must match Spark bit-for-bit."""
    from .operators.quality_classifier import (
        distill_label,
        pareto_keep,
        score_text,
        train_quality_classifier,
    )

    docs = _read_docs(sf_dir)  # already ascending doc_id
    w, b = train_quality_classifier(
        [(t, distill_label(t)) for _, t in docs[:sample]]
    )
    rows = []
    for d, t in docs:
        p = score_text(t, w, b)
        rows.append((d, p, p >= 0.5, pareto_keep(p, d)))
    return _values_sql(
        rows,
        ["doc_id", "q_prob", "keep_clf", "keep_pareto"],
        ["BIGINT", "DOUBLE", "BOOLEAN", "BOOLEAN"],
    )


def source_mixture_sql(
    sf_dir: str, temperature: float = 2.0, target_rows: int = 200
) -> str:
    """Per-source thresholds recomputed from exact DuckDB counts through
    the operator's own pure function (sorted-source float sums), then
    the per-row keep is PLAIN SQL on the shared 60-bit md5-prefix
    integer — no float crosses the engine boundary."""
    from .operators.mixing import mixture_rates

    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT source, COUNT(*) FROM"
            f" read_parquet('{sf_dir}/documents.parquet')"
            " WHERE source IS NOT NULL GROUP BY source"
        ).fetchall()
    )
    con.close()
    rates = mixture_rates(counts, temperature, target_rows)
    vals = ",\n".join(
        f"('{s.replace(chr(39), chr(39) * 2)}', {t}::UBIGINT, {rate!r})"
        for s, (rate, t) in sorted(rates.items())
    )
    return f"""
        WITH th(source, th, keep_rate) AS (VALUES
        {vals}
        )
        SELECT d.doc_id, d.source, CAST(t.keep_rate AS DOUBLE) AS keep_rate
        FROM documents d JOIN th t ON d.source = t.source
        WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                   AS UBIGINT) < t.th
    """


def semdedup_sql(sf_dir: str, kc: int = 8, iters: int = 8,
                 threshold: float = 0.85) -> str:
    """q_semdedup expected rows: re-derives the whole SemDeDup pipeline
    executor-free — centroid training on the vec_id-ordered sample
    (train_ivf_centroids' exact numpy math), nearest-centroid
    assignment, within-cluster fold-order cosines (the HOF/vectorized
    bit-parity contract), union-find components, min-id survivor."""
    emb = _read_embeddings(sf_dir)
    ids = [int(r[0]) for r in emb]
    vecs = [np.asarray(r[1], dtype=np.float64) for r in emb]
    # planted near-dups, same construction as _emb_with_neardups
    all_ids, all_vecs = list(ids), list(vecs)
    for i, vid in enumerate(ids):
        if vid % 10 == 0:
            v = vecs[i].copy()
            v[0] += 0.5
            all_ids.append(vid + 1_000_000)
            all_vecs.append(v)
    order = np.argsort(np.array(all_ids), kind="stable")
    x = np.stack(all_vecs)[order][:2048]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(17)
    cent = x[rng.choice(len(x), size=min(kc, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    mat = np.stack(all_vecs)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign_all = np.argmax(unit @ cent.T, axis=1)
    norms = [_fold_norm(v) for v in all_vecs]
    clusters: dict = {}
    for i in range(len(all_ids)):
        if norms[i] <= 0:
            continue
        clusters.setdefault(int(assign_all[i]), []).append(i)
    parent = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for members in clusters.values():
        assert len(members) <= 2048, "fixture cluster exceeds bucket cap"
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                xi, yi = members[ai], members[bi]
                cos = _fold_dot(all_vecs[xi], all_vecs[yi]) / (
                    norms[xi] * norms[yi]
                )
                if cos >= threshold:
                    union(all_ids[xi], all_ids[yi])
    rows = []
    for i in range(len(all_ids)):
        vid = all_ids[i]
        keep = find(vid) == vid  # untouched ids are their own root
        rows.append((vid, int(assign_all[i]), keep))
    return _values_sql(
        rows, ["vec_id", "ivf_cluster", "keep"],
        ["BIGINT", "BIGINT", "BOOLEAN"],
    )


# ---------------------------------------------------------------------------
# packing / DSIR oracles (round-4: the two round-3 driver hash-FAILs were
# cross-engine fragility — DuckDB window SQL + DuckDB ln() — so both are now
# pure-Python computed-literal re-derivations, no second engine in the loop)
# ---------------------------------------------------------------------------

_JAVA_WS = "[ \t\n\x0b\f\r]+"  # Java regex \s is ASCII-only; Python's isn't


def _spark_trim(t: str) -> str:
    """Twin of F.trim: strips the space character only."""
    return t.strip(" ")


def _dsir_tokens(t: str) -> List[str]:
    """Twin of operators.dsir._token_array: lower + whitespace-normalize +
    split + drop empties."""
    import re

    return [
        w
        for w in re.sub(_JAVA_WS, " ", _spark_trim(t).lower()).split(" ")
        if w != ""
    ]


def exact_substring_sql(sf_dir: str, span_tokens: int = 20) -> str:
    """q_exact_substring expected output: the operator's pure-Python twin
    (operators/exact_substring.exact_substring_dedup_rows) re-derives the
    global first-occurrence removal over the same parquet — md5 span keys
    and (doc_id, start_idx) order are engine-independent integers/strings,
    so the fixture is exact with no cross-engine float or window SQL."""
    from .operators.exact_substring import exact_substring_dedup_rows

    rows = exact_substring_dedup_rows(_read_docs(sf_dir), span_tokens)
    return _values_sql(
        rows,
        ["doc_id", "n_tokens", "n_removed", "text_dedup"],
        ["BIGINT", "INTEGER", "INTEGER", "VARCHAR"],
    )


def line_clean_sql(sf_dir: str) -> str:
    """q_line_clean expected output: same injected junk lines, same
    pure-Python line rules (operators/line_clean twin)."""
    from .operators.line_clean import line_clean_rows

    docs = []
    for d, t in _read_docs(sf_dir):
        t2 = t or ""
        if d % 3 == 0:
            t2 += "\n1234 likes"
        if d % 5 == 0:
            t2 += "\nHOME ABOUT CONTACT US"
        if d % 7 == 0:
            t2 += "\n42 17, 99%"
        if d % 11 == 0:
            t2 += "\nleia mais"
        docs.append((d, t2))
    rows = [
        (d, nl, nr, _round_like_spark(frac), keep, clean)
        for d, nl, nr, frac, keep, clean in line_clean_rows(docs)
    ]
    return _values_sql(
        rows,
        ["doc_id", "n_lines", "n_removed", "removed_frac", "doc_keep",
         "text_clean"],
        ["BIGINT", "INTEGER", "INTEGER", "DOUBLE", "BOOLEAN", "VARCHAR"],
    )


def bloom_seen_sql(sf_dir: str) -> str:
    """q_bloom_seen expected output via the operator's pure twin: same
    digests, same k positions, same bitmap — exact including FPs."""
    from .operators.bloom import bloom_rows

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    seen = [t for _, s, t in docs if s == "src0"]
    rows = bloom_rows(seen, [(d, t) for d, _, t in docs])
    return _values_sql(rows, ["doc_id", "seen"], ["BIGINT", "BOOLEAN"])


def bpe_token_totals_sql(sf_dir: str) -> str:
    """q_bpe_token_totals expected output: per-source byte-level BPE totals
    through the SAME frozen tokenizer (core/bpe.py) — exact integers."""
    from .core.bpe import bpe_token_count

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    totals: dict = {}
    for src, t in docs:
        totals[src] = totals.get(src, 0) + bpe_token_count(t or "")
    return _values_sql(
        sorted(totals.items()),
        ["source", "total_bpe_tokens"],
        ["VARCHAR", "BIGINT"],
    )


def bpe_gpt2_counts_sql(sf_dir: str) -> str:
    """q_bpe_gpt2_counts expected output: per-source (total, max, count)
    through the public-vocab seam — the frozen table serialized to the
    released merges.txt wire format and re-parsed by ByteBPE, exactly as
    the Spark pandas-UDF stage does."""
    from .core.bpe import ByteBPE, frozen_merges_txt

    bpe = ByteBPE.from_merges_txt(frozen_merges_txt())
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    agg: dict = {}
    for src, t in docs:
        n = bpe.count(t or "")
        tot, mx, cnt = agg.get(src, (0, 0, 0))
        agg[src] = (tot + n, max(mx, n), cnt + 1)
    rows = [(s, v[0], v[1], v[2]) for s, v in sorted(agg.items())]
    return _values_sql(
        rows,
        ["source", "total_bpe_tokens", "max_doc_tokens", "n_docs"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT"],
    )


def pack_sequences_sql(sf_dir: str, seq_len: int = 2048) -> str:
    """q_pack_sequences expected output: global exclusive token prefix sum
    in doc_id order over tokenizer-exact BPE counts (core/bpe.py, the same
    pure function the pandas UDF calls), re-derived with exact Python
    integers (associative, so Spark's two-phase grouped prefix sum is
    bit-identical by construction)."""
    from .core.bpe import bpe_token_count

    docs = _read_docs(sf_dir)  # already ORDER BY doc_id
    rows, running = [], 0
    for d, t in docs:
        n = bpe_token_count(t or "")
        rows.append((d, n, running, running // seq_len, running % seq_len))
        running += n
    return _values_sql(
        rows,
        ["doc_id", "n_tokens", "tok_start", "bin_id", "bin_offset"],
        ["BIGINT", "BIGINT", "BIGINT", "BIGINT", "BIGINT"],
    )


def dsir_selection_sql(
    sf_dir: str,
    *,
    target_source: str = "src0",
    num_buckets: int = 1024,
    alpha: float = 0.5,
    k: int = 100,
) -> str:
    """q_dsir_selection expected output, re-derived end-to-end in Python:
    md5-prefix bucket twin, exact integer counts, and the SAME
    operators.dsir.log_ratio_unats the Spark plan folds in as literals —
    `ln` is evaluated by exactly one libm, so no engine pair can disagree."""
    import hashlib

    from .operators.dsir import ratio_table_rows

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:7], 16) % num_buckets

    counts: dict = {}
    doc_buckets: List[Tuple[int, List[int]]] = []  # raw docs only
    for d, src, t in docs:
        tgt = src == target_source
        bs = [bucket(w) for w in _dsir_tokens(t or "")]
        for b in bs:
            ct, cr = counts.get(b, (0, 0))
            counts[b] = (ct + 1, cr) if tgt else (ct, cr + 1)
        if not tgt:
            doc_buckets.append((d, bs))
    lr = dict(ratio_table_rows(counts, num_buckets, alpha))
    scored = [
        (d, sum(lr[b] for b in bs)) for d, bs in doc_buckets if bs
    ]
    scored.sort(key=lambda r: (-r[1], r[0]))
    return _values_sql(
        scored[:k],
        ["doc_id", "dsir_weight_unats"],
        ["BIGINT", "BIGINT"],
    )


def aesthetic_nsfw_sql(sf_dir: str) -> str:
    """q_aesthetic_nsfw expected output via the pure twin
    (operators/probe_heads.probe_rows) on the same md5 stand-in heads."""
    from .operators.probe_heads import probe_rows

    rows = probe_rows(_read_embeddings(sf_dir))
    return _values_sql(
        rows,
        ["vec_id", "aes_micro", "nsfw_micro", "keep"],
        ["BIGINT", "BIGINT", "BIGINT", "BOOLEAN"],
    )
