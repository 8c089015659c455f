"""AREA2 stratified area estimation (ml/area.py) vs closed-form numbers.

The gated query (stratified_area, __spark_entry__.py) covers DuckDB
parity; these tests pin the estimator itself against hand-computed and
independently-implemented (numpy) Olofsson et al. values.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kaza_lcms_spark.ml import area as A


def _sample_df(spark, rows):
    return spark.createDataFrame(rows, "map_class long, ref_class long")


def _weights_df(spark, w):
    return spark.createDataFrame(list(w.items()), "map_class long, w double")


@pytest.fixture(scope="module")
def hand_case(spark):
    # stratum 0 (W=0.75): 8 pts — 6 ref 0, 2 ref 1
    # stratum 1 (W=0.25): 4 pts — 1 ref 0, 3 ref 1
    rows = [(0, 0)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 1 + [(1, 1)] * 3
    return _sample_df(spark, rows), _weights_df(spark, {0: 0.75, 1: 0.25})


def test_area_estimate_hand_computed(hand_case):
    sample, weights = hand_case
    out = {r["class"]: r for r in
           A.stratified_area_estimate(sample, weights).collect()}
    # p̂_0 = 0.75·6/8 + 0.25·1/4 ; p̂_1 = 0.75·2/8 + 0.25·3/4
    assert out[0]["p_hat"] == pytest.approx(0.625, abs=1e-12)
    assert out[1]["p_hat"] == pytest.approx(0.375, abs=1e-12)
    se0 = math.sqrt(0.75**2 * (0.75 * 0.25) / 7 + 0.25**2 * (0.25 * 0.75) / 3)
    assert out[0]["se"] == pytest.approx(se0, abs=1e-12)
    assert out[0]["ci_lo"] == pytest.approx(0.625 - 1.96 * se0, abs=1e-12)
    assert out[0]["ci_hi"] == pytest.approx(0.625 + 1.96 * se0, abs=1e-12)


def test_accuracy_hand_computed(hand_case):
    sample, weights = hand_case
    out = {r["class"]: r for r in
           A.stratified_accuracy(sample, weights).collect()}
    assert out[0]["users_acc"] == pytest.approx(6 / 8, abs=1e-12)
    assert out[0]["users_se"] == pytest.approx(
        math.sqrt(0.75 * 0.25 / 7), abs=1e-12)
    # P̂_0 = W_0·q_00 / p̂_0 = 0.5625 / 0.625
    assert out[0]["producers_acc"] == pytest.approx(0.9, abs=1e-12)
    assert out[1]["producers_acc"] == pytest.approx(0.1875 / 0.375, abs=1e-12)
    # Ô = Σ W_h q_hh = 0.75·0.75 + 0.25·0.75
    assert out[0]["overall_acc"] == pytest.approx(0.75, abs=1e-12)
    assert out[1]["overall_acc"] == pytest.approx(0.75, abs=1e-12)
    # V(Ô) = Σ_h (W_h·SE(Û_h))²   (Olofsson 2014 eq. 5)
    oa_se = math.sqrt(0.75**2 * (0.75 * 0.25) / 7
                      + 0.25**2 * (0.75 * 0.25) / 3)
    assert out[0]["overall_se"] == pytest.approx(oa_se, abs=1e-12)
    assert out[1]["overall_se"] == pytest.approx(oa_se, abs=1e-12)
    # V(P̂_0) (eq. 7): diag term W_0²(1−P̂)²·q_00(1−q_00)/(n_0−1),
    # off-diag term P̂²·W_1²·q_10(1−q_10)/(n_1−1), all over p̂_0²
    vdiag0 = 0.75**2 * (0.75 * 0.25) / 7
    voff0 = 0.25**2 * (0.25 * 0.75) / 3
    p_se0 = math.sqrt((1 - 0.9) ** 2 * vdiag0 + 0.9**2 * voff0) / 0.625
    assert out[0]["producers_se"] == pytest.approx(p_se0, abs=1e-12)


def _numpy_olofsson(n_hk, w):
    """Independent dense-matrix implementation of the same estimator
    (Olofsson et al. 2013 eqns 2-5): rows = map strata, cols = ref class."""
    n_hk = np.asarray(n_hk, dtype=float)
    w = np.asarray(w, dtype=float)
    n_h = n_hk.sum(axis=1, keepdims=True)
    q = n_hk / n_h
    p_hat = (w[:, None] * q).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.where(n_h > 1, (w[:, None] ** 2) * q * (1 - q) / (n_h - 1), 0.0)
    return p_hat, np.sqrt(v.sum(axis=0))


def test_area_estimate_vs_numpy_random_matrix(spark):
    rng = np.random.default_rng(90210)
    k = 5
    n_hk = rng.integers(0, 40, size=(k, k)) + np.eye(k, dtype=int) * 30
    pix = rng.integers(1000, 100000, size=k)
    w = pix / pix.sum()
    rows = [(h, r) for h in range(k) for r in range(k)
            for _ in range(int(n_hk[h, r]))]
    out = A.stratified_area_estimate(
        _sample_df(spark, rows),
        _weights_df(spark, {h: float(w[h]) for h in range(k)}))
    got = {r["class"]: r for r in out.collect()}
    p_hat, se = _numpy_olofsson(n_hk, w)
    for c in range(k):
        assert got[c]["p_hat"] == pytest.approx(p_hat[c], rel=1e-12)
        assert got[c]["se"] == pytest.approx(se[c], rel=1e-12)
    # design-based invariant: estimated proportions partition the map
    assert sum(r["p_hat"] for r in got.values()) == pytest.approx(1.0, abs=1e-12)


def _numpy_accuracy_ses(n_hk, w):
    """Independent dense implementation of Olofsson et al. 2014 eq. 5 & 7
    (overall- and producer's-accuracy variances), written directly from
    the count-form formulas rather than the proportion identities used
    by ml/area.py — a genuinely different code path."""
    n_hk = np.asarray(n_hk, dtype=float)
    w = np.asarray(w, dtype=float)
    k = n_hk.shape[0]
    n_h = n_hk.sum(axis=1)
    q = n_hk / n_h[:, None]
    p_hat = (w[:, None] * q).sum(axis=0)
    u = np.diag(q)
    oa_var = sum(w[h] ** 2 * u[h] * (1 - u[h]) / (n_h[h] - 1)
                 for h in range(k) if n_h[h] > 1)
    p_acc = w * np.diag(q) / p_hat
    p_se = np.zeros(k)
    for j in range(k):
        t1 = (w[j] ** 2 * (1 - p_acc[j]) ** 2
              * u[j] * (1 - u[j]) / (n_h[j] - 1)) if n_h[j] > 1 else 0.0
        t2 = p_acc[j] ** 2 * sum(
            w[h] ** 2 * q[h, j] * (1 - q[h, j]) / (n_h[h] - 1)
            for h in range(k) if h != j and n_h[h] > 1)
        p_se[j] = math.sqrt(t1 + t2) / p_hat[j]
    return p_acc, p_se, float(np.dot(w, u)), math.sqrt(oa_var)


def test_accuracy_ses_vs_numpy_random_matrix(spark):
    rng = np.random.default_rng(51515)
    k = 5
    n_hk = rng.integers(0, 40, size=(k, k)) + np.eye(k, dtype=int) * 30
    pix = rng.integers(1000, 100000, size=k)
    w = pix / pix.sum()
    rows = [(h, r) for h in range(k) for r in range(k)
            for _ in range(int(n_hk[h, r]))]
    out = {r["class"]: r for r in A.stratified_accuracy(
        _sample_df(spark, rows),
        _weights_df(spark, {h: float(w[h]) for h in range(k)})).collect()}
    p_acc, p_se, oa, oa_se = _numpy_accuracy_ses(n_hk, w)
    for c in range(k):
        assert out[c]["producers_acc"] == pytest.approx(p_acc[c], rel=1e-12)
        assert out[c]["producers_se"] == pytest.approx(p_se[c], rel=1e-12)
        assert out[c]["overall_acc"] == pytest.approx(oa, rel=1e-12)
        assert out[c]["overall_se"] == pytest.approx(oa_se, rel=1e-12)


def test_singleton_stratum_contributes_zero_variance(spark):
    # stratum 1 has a single sample point: n_h−1 = 0 must not divide
    rows = [(0, 0)] * 4 + [(0, 1)] * 4 + [(1, 1)]
    out = {r["class"]: r for r in A.stratified_area_estimate(
        _sample_df(spark, rows), _weights_df(spark, {0: 0.9, 1: 0.1})).collect()}
    se1 = math.sqrt(0.9**2 * 0.25 / 7)          # only stratum 0 contributes
    assert out[1]["se"] == pytest.approx(se1, abs=1e-12)
    assert not math.isnan(out[1]["se"])


def test_pure_strata_zero_se_and_total_area(spark):
    rows = [(0, 0)] * 5 + [(1, 1)] * 5
    out = A.stratified_area_estimate(
        _sample_df(spark, rows), _weights_df(spark, {0: 0.6, 1: 0.4}),
        total_area=2500.0)
    got = {r["class"]: r for r in out.collect()}
    assert got[0]["se"] == 0.0 and got[1]["se"] == 0.0
    assert got[0]["area"] == pytest.approx(1500.0)
    assert got[1]["area"] == pytest.approx(1000.0)
    assert got[0]["area_se"] == 0.0


def test_stratum_weights_from_map(spark):
    mapped = spark.range(1000).select(
        (F.col("id") % 4).cast("long").alias("map_class"))
    w = {r["map_class"]: r["w"] for r in A.stratum_weights(mapped).collect()}
    assert w == {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}


def test_unmapped_reference_class_gets_null_users_acc(spark):
    # class 2 appears only as a reference label, never as a map stratum
    rows = [(0, 0)] * 3 + [(0, 2)] + [(1, 1)] * 4
    out = {r["class"]: r for r in A.stratified_accuracy(
        _sample_df(spark, rows), _weights_df(spark, {0: 0.5, 1: 0.5})).collect()}
    assert out[2]["users_acc"] is None
    assert out[2]["producers_acc"] is None
    assert out[0]["producers_acc"] is not None


def test_all_wrong_stratum_reads_zero_users_acc_not_null(spark):
    # stratum 1 is mapped but every sample point is misclassified:
    # user's accuracy is an OBSERVED 0.0; only never-mapped classes
    # (class 2 here) read NULL
    rows = [(0, 0)] * 4 + [(1, 0)] * 2 + [(1, 2)] * 2
    out = {r["class"]: r for r in A.stratified_accuracy(
        _sample_df(spark, rows), _weights_df(spark, {0: 0.5, 1: 0.5})).collect()}
    assert out[1]["users_acc"] == 0.0
    assert out[1]["users_se"] == 0.0
    assert out[2]["users_acc"] is None
    # OA counts only stratum 0's diagonal: 0.5·1.0 + 0.5·0.0
    assert out[0]["overall_acc"] == pytest.approx(0.5, abs=1e-12)


def test_coverage_guard_raises_on_unsampled_stratum(spark):
    # stratum 2 carries weight but no sample points: its whole area
    # share would silently vanish (Σp̂ < 1) — must fail loudly
    rows = [(0, 0)] * 3 + [(1, 1)] * 3
    sample = _sample_df(spark, rows)
    weights = _weights_df(spark, {0: 0.5, 1: 0.3, 2: 0.2})
    with pytest.raises(ValueError, match="no sample points: \\[2\\]"):
        A.stratified_area_estimate(sample, weights)
    with pytest.raises(ValueError, match="no sample points"):
        A.stratified_accuracy(sample, weights)
    # explicit opt-out degrades to the (biased) partial estimate
    got = {r["class"]: r["p_hat"] for r in A.stratified_area_estimate(
        sample, weights, check_coverage=False).collect()}
    assert sum(got.values()) == pytest.approx(0.8, abs=1e-12)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(2, 5), st.integers(0, 2**31 - 1), st.integers(0, 2))
@settings(max_examples=10, deadline=None)
def test_estimator_matches_numpy_on_random_tables(spark, k, seed, sparsity):
    """Hypothesis sweep: random confusion tables — including singleton
    strata (n_h == 1), all-wrong strata (zero diagonal), and sparse
    cells — must match both independent numpy implementations on every
    emitted column."""
    rng = np.random.default_rng(seed)
    n_hk = rng.integers(0, 12, size=(k, k))
    n_hk[n_hk < sparsity * 3] = 0                    # punch holes
    for h in range(k):                               # every stratum sampled
        if n_hk[h].sum() == 0:
            n_hk[h, rng.integers(0, k)] = 1
    for j in range(k):                               # every class observed
        if n_hk[:, j].sum() == 0:
            n_hk[rng.integers(0, k), j] = 1
    pix = rng.integers(100, 10_000, size=k)
    w = pix / pix.sum()

    rows = [(h, r) for h in range(k) for r in range(k)
            for _ in range(int(n_hk[h, r]))]
    sdf = _sample_df(spark, rows)
    wdf = _weights_df(spark, {h: float(w[h]) for h in range(k)})
    est = {r["class"]: r for r in
           A.stratified_area_estimate(sdf, wdf).collect()}
    acc = {r["class"]: r for r in A.stratified_accuracy(sdf, wdf).collect()}

    p_hat, se = _numpy_olofsson(n_hk, w)
    p_acc, p_se, oa, oa_se = _numpy_accuracy_ses(n_hk, w)
    for c in range(k):
        assert est[c]["p_hat"] == pytest.approx(p_hat[c], rel=1e-12)
        assert est[c]["se"] == pytest.approx(se[c], rel=1e-12, abs=1e-15)
        assert acc[c]["producers_acc"] == pytest.approx(p_acc[c], rel=1e-12)
        assert acc[c]["producers_se"] == pytest.approx(p_se[c], rel=1e-12,
                                                      abs=1e-15)
        assert acc[c]["overall_acc"] == pytest.approx(oa, rel=1e-12)
        assert acc[c]["overall_se"] == pytest.approx(oa_se, rel=1e-12,
                                                    abs=1e-15)
