"""Composite operators vs numpy closed forms (SURVEY.md §5.1-5.2):
harmonic OLS = np.linalg.lstsq, percentiles = np.percentile(linear),
simple OLS = np.polyfit."""

import numpy as np
import pytest

from kaza_lcms_spark.operators import composite as C


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for g in ("a", "b", "c"):
        t = rng.random(400) * 3.0
        amp, ph, tr, off = rng.random(4) * 2
        y = off + tr * t + amp * np.cos(2 * np.pi * t + ph) + rng.normal(0, .05, 400)
        rows += [(g, float(tt), float(yy)) for tt, yy in zip(t, y)]
    df = spark.createDataFrame(rows, "grp string, t double, y double")
    return df, rows


def test_harmonic_fit_matches_lstsq(spark, series_df):
    df, rows = series_df
    out = {r["grp"]: r for r in C.harmonic_fit(df, "grp", "t", "y").collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append((t, y))
    for g, pts in by.items():
        t = np.array([p[0] for p in pts]); y = np.array([p[1] for p in pts])
        X = np.stack([np.ones_like(t), t, np.cos(2 * np.pi * t),
                      np.sin(2 * np.pi * t)], axis=1)
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = out[g]
        got = [r["coef_c"], r["coef_t"], r["coef_cos"], r["coef_sin"]]
        assert np.allclose(got, coef, atol=1e-8), g
        assert r["amplitude"] == pytest.approx(np.hypot(coef[2], coef[3]))
        assert r["phase"] == pytest.approx(np.arctan2(coef[2], coef[3]))


def test_percentile_composite_matches_numpy(spark, series_df):
    df, rows = series_df
    out = {r["grp"]: r for r in
           C.percentile_composite(df, "grp", ["y"]).collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append(y)
    for g, ys in by.items():
        for p in (10, 25, 50, 75, 90):
            want = np.percentile(ys, p, method="linear")
            assert out[g][f"p{p}_y"] == pytest.approx(want), (g, p)


def test_percentile_approx_error_bound(spark, series_df):
    """A1 scale path: the GK-sketch composite must sit within the rank
    error bound of the exact composite (values, not ranks: bound the
    value gap by comparing against the exact percentiles at ±1.5/accuracy
    rank offsets)."""
    df, rows = series_df
    acc = 1000
    exact = {r["grp"]: r for r in
             C.percentile_composite(df, "grp", ["y"]).collect()}
    approx = {r["grp"]: r for r in
              C.percentile_composite_approx(df, "grp", ["y"], accuracy=acc).collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append(y)
    for g, ys in by.items():
        for p in (10, 25, 50, 75, 90):
            got = approx[g][f"p{p}_y"]
            lo = np.percentile(ys, max(p - 100 * 1.5 / acc, 0), method="lower")
            hi = np.percentile(ys, min(p + 100 * 1.5 / acc, 100), method="higher")
            assert lo <= got <= hi, (g, p, got, lo, hi)
            # and close to the exact interpolated value on this data
            assert got == pytest.approx(exact[g][f"p{p}_y"], abs=0.05), (g, p)


def test_ols_simple_matches_polyfit(spark, series_df):
    df, rows = series_df
    out = {r["grp"]: r for r in C.ols_simple(df, "grp", "t", "y").collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append((t, y))
    for g, pts in by.items():
        t = np.array([p[0] for p in pts]); y = np.array([p[1] for p in pts])
        slope, icept = np.polyfit(t, y, 1)
        assert out[g]["slope"] == pytest.approx(slope)
        assert out[g]["intercept"] == pytest.approx(icept)


def test_mean_composite(spark, series_df):
    df, rows = series_df
    out = {r["grp"]: r["mean_y"] for r in C.mean_composite(df, "grp", ["y"]).collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append(y)
    for g, ys in by.items():
        assert out[g] == pytest.approx(np.mean(ys))


def test_fused_approx_composite(spark, series_df):
    """A1 approx inside the FUSED agg (the multi-decade-archive path):
    percentile columns within the GK rank-error bound of exact; harmonic
    columns identical (same Gram sums either way)."""
    df, rows = series_df
    acc = 1000
    exact = {r["grp"]: r for r in C.percentile_harmonic_composite(
        df, "grp", ["y"], "t", "y").collect()}
    approx = {r["grp"]: r for r in C.percentile_harmonic_composite(
        df, "grp", ["y"], "t", "y", approx=True, accuracy=acc).collect()}
    import collections
    by = collections.defaultdict(list)
    for g, t, y in rows:
        by[g].append(y)
    for g, ys in by.items():
        for p in (10, 25, 50, 75, 90):
            got = approx[g][f"p{p}_y"]
            lo = np.percentile(ys, max(p - 100 * 1.5 / acc, 0), method="lower")
            hi = np.percentile(ys, min(p + 100 * 1.5 / acc, 100), method="higher")
            assert lo <= got <= hi, (g, p, got, lo, hi)
        for c in ("coef_c", "coef_t", "coef_cos", "coef_sin",
                  "phase", "amplitude"):
            assert approx[g][c] == pytest.approx(exact[g][c], rel=1e-12), (g, c)


def test_fused_multiband_harmonics(spark, series_df):
    """Multi-band harmonics (reference fits nir + swir1): fused list-y
    output == per-band unfused harmonic_fit, with _{band} suffixes."""
    from pyspark.sql import functions as F
    df, rows = series_df
    df2 = df.withColumn("y2", F.col("y") * 0.5 + 1.0)
    fused = {r["grp"]: r for r in C.percentile_harmonic_composite(
        df2, "grp", ["y"], "t", ["y", "y2"]).collect()}
    for band in ("y", "y2"):
        want = {r["grp"]: r for r in
                C.harmonic_fit(df2, "grp", "t", band).collect()}
        for g in want:
            for n in ("c", "t", "cos", "sin"):
                assert fused[g][f"coef_{n}_{band}"] == pytest.approx(
                    want[g][f"coef_{n}"], rel=1e-9), (g, n, band)
            assert fused[g][f"phase_{band}"] == pytest.approx(want[g]["phase"])
            assert fused[g][f"amplitude_{band}"] == pytest.approx(
                want[g]["amplitude"])


def test_fused_null_contracts(spark):
    """Under-determined groups emit NULL (not NaN: isNull misses NaN and
    NaN sorts greatest) harmonic columns, and a null-t row is excluded
    from ALL sufficient-statistic sums, not just the t-dependent ones."""
    from pyspark.sql import functions as F
    rows = [
        (0, 0.1, 1.0), (0, 0.4, 2.0),                      # < 4 rows
        (1, 0.0, 1.0), (1, 0.2, 2.0), (1, 0.5, 1.5),
        (1, 0.7, 0.5), (1, 0.9, 1.2),
        (1, None, 99.0),                                   # null t
    ]
    df = spark.createDataFrame(rows, "g long, t double, y double")
    out = {r["g"]: r for r in C.percentile_harmonic_composite(
        df, "g", ["y"], "t", "y").collect()}
    for c in ("coef_c", "coef_t", "coef_cos", "coef_sin",
              "phase", "amplitude"):
        assert out[0][c] is None, c
    clean = df.where(F.col("t").isNotNull())
    want = {r["g"]: r for r in C.harmonic_fit(clean, "g", "t", "y").collect()}
    for n in ("c", "t", "cos", "sin"):
        assert out[1][f"coef_{n}"] == pytest.approx(
            want[1][f"coef_{n}"], rel=1e-9), n
