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

# Representative in-window queries per operator family (the driver gates
# the first 50 queries() entries itself; full sweep in tools/parity.py).
IN_WINDOW_SUBSET = [
    "tile_assignment", "tile_zonal", "cell_morton", "distance_pairs",
    "stratified_sample", "pct_composite", "ols_trend", "argmax_user_type",
    "minhash_signatures", "simhash", "ann_cosine_topk",
    "harmonic_phase_amp", "harmonic_rgb", "terrain_correction",
    "cosine_near_dup", "cosine_topk_blocked", "intersect_keys", "lsh_pairs",
    "stratified_area",
]

# Every oracle-gated query displaced past the driver's 50-entry gate
# window stays continuously gated here (r3 advice item #2) — computed
# dynamically so a queries() reorder can never silently un-gate one.
OFF_WINDOW = [n for n in list(E.queries())[50:] if n in E.oracle_sql()]

SUBSET = IN_WINDOW_SUBSET + OFF_WINDOW


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
