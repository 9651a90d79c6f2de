"""Local replica of the driver's correctness gate: every queries() entry
runs on Spark and, when an oracle_sql() entry exists, must match DuckDB
row-for-row (columns sorted by name, rows sorted, values compared)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
# fixture oracles (oracle_support.py) recompute expected values from the
# parquet dir; point them at the same sf this test runs the queries on
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.6g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    assert len(srows) >= 0  # must execute

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(srows) > 0  # rows-only check for model-backed ops
        return
    res = duck.execute(sql)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    scols = sdf.columns
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows)
    got = _canon([[r[c] for c in scols] for r in srows], scols)
    exp = _canon(drows, dcols)
    mismatches = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mismatches, (name, [(got[i], exp[i]) for i in mismatches[:3]])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert {"doc_id", "keep", "scrubbed_caption", "scrub_count"} <= set(df.columns)
