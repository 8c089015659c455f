"""End-to-end KAZA land-cover workflow, re-grounded Spark-first.

Mirrors the reference's five pipeline stages (ProjectWorkflow.md:3-10):

  00sample_pts   → sample_points()           (stratified pixel sample)
  02train_test   → train_test_from_polygons() (points in labeled polygons
                                               + band extraction + split)
  03RFprimitives → ml.primitives.primitives_to_collection()
  04generate_LC  → ml.primitives.assemble_max_prob()
  05accuracy     → score_accuracy()

(01composite_s2's feature building is operators/composite.py; here the
landcover_cells fixture already carries covariate bands.)

Scale shape: the only shuffles are (a) the per-class window top-k in
sampling (keyed by class — ≤8 reducers of partial-sorted streams), (b)
the cell-keyed extraction equi-join, (c) the assemblage window keyed by
cell. Everything else is narrow or a broadcast.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernels import grid
from .ml import primitives as P
from .operators import sampling as S
from .operators import spatial_join as SJ

BAND_COLS = ["blue", "green", "red", "nir", "swir1", "swir2"]


def sample_points(lc_cells: DataFrame, n_per_class: int | dict,
                  label_col: str = "LANDCOVER",
                  key_col: str = "cell_id") -> DataFrame:
    """00sample_pts: stratified random sample from the categorical cell
    table, CEO-formatted (reference src/00sample_pts.py:184-208 →
    stratifiedSample src/utils/sampling.py:163-182). Exact per-class
    counts, deterministic in the cell id."""
    s = S.stratified_topk(lc_cells.where(F.col(label_col).isNotNull()),
                          label_col, key_col, n_per_class)
    return s.select(key_col, label_col, "lon", "lat")


def train_test_from_polygons(spark: SparkSession, ref_polys: DataFrame,
                             lc_cells: DataFrame, n_per_class: int,
                             oversample: int = 2, lc_level: int = 12,
                             label_col: str = "LANDCOVER") -> tuple[DataFrame, DataFrame]:
    """02train_test: random points inside labeled reference polygons,
    band extraction at each point's cell, exact per-class top-k, 80/20
    split (reference strat_sample_w_extraction,
    src/utils/sampling.py:115-159 + split :184-193).

    The raster×vector extraction join (J4) is an equi-join on cell_id —
    point cells computed by the vectorized encoder; the cell table side is
    already keyed. At 10¹² cells both sides shuffle on cell_id; at fixture
    scale Catalyst broadcasts the points."""
    pts = S.random_points_in_polygons(ref_polys, n_per_class * oversample)
    pts = pts.join(ref_polys.select("unit_id", label_col), "unit_id")
    pts = SJ.with_cell(pts, lc_level)
    pts = pts.withColumn(
        "pt_key", (F.col("unit_id").cast("long") * F.lit(1 << 20)) + F.col("pt_seq"))
    extracted = pts.join(
        lc_cells.select("cell_id", *BAND_COLS), "cell_id", "inner")
    sampled = S.stratified_topk(extracted, label_col, "pt_key", n_per_class)
    train, test = S.train_test_split(sampled, "pt_key", 0.8)
    return train, test


def build_landcover(spark: SparkSession, train: DataFrame, lc_cells: DataFrame,
                    classes: list[int] | None = None) -> DataFrame:
    """03RFprimitives + 04generate_LC: per-class probability primitives →
    argmax assemblage → (cell_id, LANDCOVER, max_prob). Wide single-pass
    inference (chained broadcast-model transforms + array argmax — zero
    shuffles; identical output to the tall union+window path, tested)."""
    train = train.cache()
    wide, cls = P.primitives_wide(train, lc_cells, BAND_COLS, classes)
    return P.assemble_max_prob_wide(wide, cls)


def score_accuracy(predicted: DataFrame, test: DataFrame) -> tuple[DataFrame, float]:
    """05accuracy: confusion matrix + per-class accuracies on test points
    (reference src/misc/05accuracy.py:66-133)."""
    scored = (test.select("cell_id", "LANDCOVER")
              .join(predicted.select("cell_id",
                                     F.col("LANDCOVER").alias("pred")), "cell_id"))
    cm = P.confusion_matrix(scored)
    return P.class_accuracies(cm), P.overall_accuracy(cm)


def score_area(predicted: DataFrame, test: DataFrame,
               total_area: float | None = None,
               nodata: int | None = None,
               check_coverage: bool = True) -> tuple[DataFrame, DataFrame]:
    """Step 6, AREA2 'Stratified Estimation'
    (/root/reference/ProjectWorkflow.md:225-256): the final LANDCOVER map
    is the stratification, the held-out testing points are the sample.
    Returns (area_estimates, accuracies) — per-class unbiased area
    proportions with SE + 95% CI, and the stratified user's/producer's/
    overall accuracies the AREA2 console prints (ml/area.py, Olofsson
    estimator). Exactly TWO full-map passes, each materialized once
    here: the stratum-weight hash-agg and the sample-extraction join
    (broadcast on the tiny test side). Both results are ≤ test-size
    rows, so they are collected and re-created as local frames —
    downstream actions on the returned estimates never re-scan the map.

    ``nodata`` mirrors the AREA2 UI's third dialog (a class value outside
    the LANDCOVER typology): cells carrying it are excluded from the
    stratification — their area is not estimated and they contribute no
    stratum weight. ``check_coverage=False`` skips the unsampled-stratum
    guard (accepting biased-low proportions) the same way the ml.area
    functions do; when True the guard runs exactly once here, not once
    per downstream estimate."""
    from pyspark.sql.functions import broadcast

    from .ml import area as A

    spark = predicted.sparkSession
    if nodata is not None:
        predicted = predicted.where(F.col("LANDCOVER") != nodata)
    weights = A.stratum_weights(
        predicted.select(F.col("LANDCOVER").alias("map_class")))
    weights = spark.createDataFrame(weights.collect(), weights.schema)
    sample = (broadcast(test.select("cell_id",
                                    F.col("LANDCOVER").alias("ref_class")))
              .join(predicted.select("cell_id",
                                     F.col("LANDCOVER").alias("map_class")),
                    "cell_id"))
    sample = spark.createDataFrame(sample.collect(), sample.schema)
    if check_coverage:
        A._check_stratum_coverage(sample, weights, "map_class")
    est = A.stratified_area_estimate(sample, weights, total_area=total_area,
                                     check_coverage=False)
    acc = A.stratified_accuracy(sample, weights, check_coverage=False)
    return est, acc


def run_composite_workflow(spark: SparkSession, fixture_dir: str,
                           n_per_class: int = 150, n_trees: int = 100) -> dict:
    """The chained 01→03→04→05 workflow over ENGINE outputs: build the
    annual composite from the raw time series (cloud mask → indices →
    percentile/harmonic features), label its cells from the categorical
    raster via the cell hierarchy (level-13 → parent level-12 equi-join —
    the reprojection W3 as a pure integer shift), train per-class RF
    primitives on the composite features, assemble argmax land cover, and
    score accuracy on held-out cells."""
    from pyspark.sql.types import LongType

    from .operators import composite_pipeline as CP
    from .operators import sampling as S

    ts = spark.read.parquet(f"{fixture_dir}/s2_timeseries.parquet")
    lc = spark.read.parquet(f"{fixture_dir}/landcover_cells.parquet")
    # two harmonic bands like the reference's model inputs (nir + swir1,
    # /root/reference/src/utils/harmonics.py:79-124) — still one hash-agg
    comp = CP.build_composite(ts, harmonic_band=["nir", "swir1"])

    @F.pandas_udf(LongType())
    def parent12(cell: pd.Series) -> pd.Series:
        return pd.Series(grid.parent(cell.to_numpy(), 12))

    labeled = (comp.withColumn("p12", parent12(F.col("cell_id")))
               .join(lc.select(F.col("cell_id").alias("p12"), "LANDCOVER"), "p12")
               .drop("p12").dropna())
    feature_cols = ([c for c in labeled.columns
                     if c.startswith(("p10_", "p25_", "p50_", "p75_", "p90_"))]
                    + [c for c in labeled.columns
                       if c.startswith(("amplitude", "phase"))])
    sampled = S.stratified_topk(labeled, "LANDCOVER", "cell_id", n_per_class)
    train, test = S.train_test_split(sampled, "cell_id", 0.8)
    train = train.cache(); test = test.cache()

    wide, cls = P.primitives_wide(train, labeled, feature_cols,
                                  n_trees=n_trees)
    # cache: accuracy, area estimation and the count below each action
    # this frame — uncached they'd re-run the 8-model inference chain
    landcover = P.assemble_max_prob_wide(wide, cls).cache()
    accs, overall = score_accuracy(landcover, test)
    # Step 6 (AREA2): stratified area proportions + CIs from the final
    # map and the held-out cells — the workflow's closing deliverable
    est, _ = score_area(landcover, test)
    return {
        "n_features": len(feature_cols), "n_train": train.count(),
        "n_test": test.count(), "n_cells": landcover.count(),
        "overall_acc": overall,
        "area_proportions": {r["class"]: (r["p_hat"], r["se"])
                             for r in est.collect()},
    }


def run_full_pipeline(spark: SparkSession, fixture_dir: str,
                      n_per_class: int = 60) -> dict:
    """The whole reference workflow on fixtures; returns summary metrics."""
    lc = spark.read.parquet(f"{fixture_dir}/landcover_cells.parquet")
    refp = spark.read.parquet(f"{fixture_dir}/ref_polygons.parquet")
    train, test = train_test_from_polygons(spark, refp, lc, n_per_class)
    train = train.cache(); test = test.cache()
    landcover = build_landcover(spark, train, lc).cache()
    accs, overall = score_accuracy(landcover, test)
    return {
        "n_train": train.count(), "n_test": test.count(),
        "n_cells": landcover.count(), "overall_acc": overall,
        "class_acc": {r["label"]: (r["producers_acc"], r["users_acc"])
                      for r in accs.collect()},
    }
