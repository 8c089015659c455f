"""Replica of the driver's DuckDB correctness gate (subset, sf0.001).

Full sweep: ``python tools/parity.py /root/testdata/sf0.01``.
"""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# representative queries per operator family (full set runs in tools/parity.py)
SUBSET = [
    "tile_assignment", "tile_zonal", "cell_morton", "distance_pairs",
    "stratified_sample", "pct_composite", "ols_trend", "argmax_user_type",
    "minhash_signatures", "simhash", "fingerprint", "ann_cosine_topk",
    "harmonic_phase_amp", "harmonic_rgb", "terrain_correction",
    "cosine_near_dup", "cosine_topk_blocked", "intersect_keys", "lsh_pairs",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple("NaN" if isinstance(r[i], float) and math.isnan(r[i])
                         else r[i] for i in order))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(E.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon(srows, sdf.columns) == canon(drows, dcols)
