"""Deterministic 10x scale-up of the driver's sf0.1 tables -> .scale_data/sf1.

Round-3 VERDICT #2: "within 2x of baseline" was proven only at sf0.1;
linearity was claimed, not shown. The driver testdata is read-only and
tops out at sf0.1, so this derives an sf1 set from it, deterministically,
with the join graph and distribution SHAPES preserved:

  * fact tables get 10 copies with disjoint key ranges; foreign keys
    shift consistently (orders.o_custkey follows customer.c_custkey,
    lineitem.l_orderkey follows orders.o_orderkey), so every join query
    scales 10x on both sides without dangling keys;
  * dimension tables (region nation supplier part) stay as-is, exactly
    like real TPC-H scaling keeps nation at 25 rows;
  * document text is made UNIQUE per copy (every word suffixed with the
    copy letter) — verbatim copies would hand the near-dup queries 10-way
    identical clusters and measure a data-construction artifact instead
    of engine scaling. Word/char counts shift by one char per word; the
    heuristic-quality and token-count workloads keep their shape;
  * embeddings get a per-copy deterministic sign-flip pattern (half the
    components), which preserves norms exactly and makes cross-copy
    cosine ~0 — near-pair density stays data-like instead of exploding;
  * events copies get fresh user_id ranges (sessions/sketches scale in
    user count) and fresh event_ids; timestamps/types/values keep the
    original skew and window distribution.

Pure derivation from the driver's own parquet — no external data, no
wall-clock, seedless (copy index is the only variation source).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_data", "sf1")
COPIES = 10


def _src(t: str) -> str:
    return f"read_parquet('{SRC}/{t}.parquet')"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def copy_dim(t: str) -> None:
        con.execute(f"COPY (SELECT * FROM {_src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

    for t in ("region", "nation", "supplier", "part"):
        copy_dim(t)

    n_doc = con.execute(f"SELECT max(doc_id)+1 FROM {_src('documents')}").fetchone()[0]
    n_cust = con.execute(f"SELECT max(c_custkey)+1 FROM {_src('customer')}").fetchone()[0]
    n_ord = con.execute(f"SELECT max(o_orderkey)+1 FROM {_src('orders')}").fetchone()[0]
    n_ev = con.execute(f"SELECT max(event_id)+1 FROM {_src('events')}").fetchone()[0]
    n_user = con.execute(f"SELECT max(user_id)+1 FROM {_src('events')}").fetchone()[0]
    n_vec = con.execute(f"SELECT max(vec_id)+1 FROM {_src('embeddings')}").fetchone()[0]

    # documents: copy k suffixes every word with chr('a'+k-1) (k=0 verbatim)
    parts = ["SELECT doc_id, text, lang, source, n_chars FROM " + _src("documents")]
    for k in range(1, COPIES):
        suf = chr(ord("a") + k - 1)
        parts.append(f"""
            SELECT doc_id + {k * n_doc} AS doc_id,
                   array_to_string(list_transform(string_split(text, ' '),
                                                  w -> w || '{suf}'), ' ') AS text,
                   lang, source,
                   CAST(n_chars + len(string_split(text, ' ')) AS BIGINT) AS n_chars
            FROM {_src('documents')}
        """)
    con.execute(f"COPY ({' UNION ALL '.join(parts)} ORDER BY doc_id) "
                f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")

    # customer / orders / lineitem: consistent key shifts
    parts = [f"SELECT * FROM {_src('customer')}"] + [
        f"""SELECT c_custkey + {k * n_cust} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment FROM {_src('customer')}"""
        for k in range(1, COPIES)
    ]
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/customer.parquet' (FORMAT PARQUET)")

    parts = [f"SELECT * FROM {_src('orders')}"] + [
        f"""SELECT o_orderkey + {k * n_ord} AS o_orderkey,
                   o_custkey + {k * n_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {_src('orders')}"""
        for k in range(1, COPIES)
    ]
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/orders.parquet' (FORMAT PARQUET)")

    parts = [f"SELECT * FROM {_src('lineitem')}"] + [
        f"""SELECT l_orderkey + {k * n_ord} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM {_src('lineitem')}"""
        for k in range(1, COPIES)
    ]
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)")

    # events: new users + event ids per copy, same time/skew distribution
    parts = [f"SELECT * FROM {_src('events')}"] + [
        f"""SELECT event_id + {k * n_ev} AS event_id, ts,
                   user_id + {k * n_user} AS user_id,
                   event_type, value, props
            FROM {_src('events')}"""
        for k in range(1, COPIES)
    ]
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/events.parquet' (FORMAT PARQUET)")

    # embeddings: numpy sign-flip pattern per copy (norm-preserving,
    # cross-copy cosine ~0); flip mask = deterministic per (k, component)
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM {_src('embeddings')} ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float32) for r in rows])
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    dim = mat.shape[1]
    all_ids, all_vecs, all_labels = [ids], [mat], [labels]
    for k in range(1, COPIES):
        signs = np.where((np.arange(dim) * (2 * k + 1)) % 10 < 5, 1.0, -1.0).astype(np.float32)
        all_ids.append(ids + k * n_vec)
        all_vecs.append(mat * signs[None, :])
        all_labels.append(labels)
    out_ids = np.concatenate(all_ids)
    out_mat = np.concatenate(all_vecs)
    out_labels = np.concatenate(all_labels)
    table = pa.table({
        "vec_id": pa.array(out_ids),
        "embedding": pa.array(list(out_mat), type=pa.list_(pa.float32())),
        "label": pa.array(out_labels),
    })
    pq.write_table(table, f"{DST}/embeddings.parquet")

    for t in ("documents", "embeddings", "events", "orders", "customer",
              "lineitem", "nation", "region", "supplier", "part"):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t:12s} {n:9d} rows")
    print(f"sf1 written to {DST}")


if __name__ == "__main__":
    sys.exit(main())
