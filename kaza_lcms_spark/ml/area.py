"""Stratified area estimation with standard errors — the AREA2 step.

Re-grounds the reference workflow's final deliverable: Step 6 of
``/root/reference/ProjectWorkflow.md:225-256`` applies the AREA2
"Stratified Estimation" tool to the final LANDCOVER image (the
stratification) and the held-out testing points
(``/root/reference/src/02train_test.py`` split), printing per-class
unbiased area proportions with confidence intervals plus the
stratified accuracy metrics. The estimator is the public
Olofsson / Stehman design-based stratified estimator (Olofsson et al.
2013 "Making better use of accuracy data...", RSE 129; Olofsson et al.
2014 "Good practices...", RSE 148 — both cited by the AREA2 docs):

* stratum weights ``W_h = N_h / N`` — map-pixel share of stratum ``h``
* cell proportions ``q_hk = n_hk / n_h`` from the sample confusion
  matrix (``n_hk`` = sample points mapped ``h``, reference-labelled ``k``)
* area proportion of class ``k``:  ``p̂_k = Σ_h W_h · q_hk``
* its standard error:  ``SE(p̂_k) = sqrt(Σ_h W_h² · q_hk(1−q_hk)/(n_h−1))``
* user's accuracy of stratum ``h``: ``Û_h = q_hh``,
  ``SE(Û_h) = sqrt(q_hh(1−q_hh)/(n_h−1))``
* producer's accuracy of class ``k``: ``P̂_k = W_k·q_kk / p̂_k``, with
  (Olofsson et al. 2014 eq. 7, in proportion form)
  ``V(P̂_k) = [ W_k²(1−P̂_k)²·Û_k(1−Û_k)/(n_k−1)
  + P̂_k²·Σ_{h≠k} W_h²·q_hk(1−q_hk)/(n_h−1) ] / p̂_k²``
* overall accuracy: ``Ô = Σ_h W_h · q_hh``, with (eq. 5)
  ``V(Ô) = Σ_h W_h²·q_hh(1−q_hh)/(n_h−1)``

Two algebraic identities keep the SQL small: the ``h = k`` diagonal term
of the ``p̂_k`` variance sum is the stratum's own variance term
``W_k²·q_kk(1−q_kk)/(n_k−1)`` (algebraically ``(W_k·SE(Û_k))²``), and
the overall variance is the sum of those diagonal terms — so producer's
and overall SEs need only the per-class variance sum already computed
for the area estimate plus one per-stratum column. The diagonal term is
computed with the same expression shape as the sum's terms (never by
squaring the SE's square root) so the off-diagonal subtraction cancels
exactly for classes with no off-diagonal variance.

Everything is plain SQL over two tiny aggregates (the sample confusion
matrix and the stratum pixel totals), so at 100 TB the only full-data
pass is the ``groupBy(map_class).count()`` computing ``N_h`` — one
partial-combined hash-agg; the sample-side math is a broadcast-sized
join. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z95 = 1.96  # two-sided 95% normal quantile, as printed by the AREA2 console


def stratum_weights(mapped: DataFrame, map_col: str = "map_class") -> DataFrame:
    """``(map_class, w)`` with ``w = N_h / N`` from the full map table.

    The one full-data pass of the estimator — a single partial-combined
    hash-agg; the window total is computed over the already-aggregated
    (≤ n_classes rows) frame, not the raw data.
    """
    counts = mapped.groupBy(map_col).agg(F.count(F.lit(1)).alias("n_pix"))
    total = counts.agg(F.sum("n_pix").alias("t"))
    return (counts.crossJoin(F.broadcast(total))
            .select(map_col, (F.col("n_pix") / F.col("t")).alias("w")))


def _check_stratum_coverage(sample: DataFrame, weights: DataFrame,
                            map_col: str) -> None:
    """Fail loudly when the sample and the stratification disagree:
    a weighted stratum with ZERO sample points silently loses its whole
    area share (Σp̂ < 1, every class biased low), and a sampled stratum
    missing from the weights is silently dropped by the inner join.
    AREA2 requires n_h ≥ 2 per stratum; we degrade the n_h == 1 variance
    gracefully but refuse the n_h == 0 case. Two tiny aggregations."""
    w_strata = {r[0] for r in weights.select(map_col).distinct().collect()}
    s_strata = {r[0] for r in sample.select(map_col).distinct().collect()}
    unsampled = sorted(w_strata - s_strata)
    unweighted = sorted(s_strata - w_strata)
    if unsampled or unweighted:
        raise ValueError(
            "stratified estimation coverage mismatch: "
            f"strata with weight but no sample points: {unsampled}; "
            f"sampled strata missing from weights: {unweighted}. "
            "Add testing points for every map stratum (or rebuild the "
            "weights from the same map the sample was drawn against); "
            "pass check_coverage=False only to accept biased-low "
            "proportions knowingly.")


def _joined_cells(sample: DataFrame, weights: DataFrame,
                  map_col: str, ref_col: str) -> DataFrame:
    """Sample confusion cells joined with stratum sizes and weights:
    ``(map_col, ref_col, n_hk, n_h, w)``."""
    cm = sample.groupBy(map_col, ref_col).agg(F.count(F.lit(1)).alias("n_hk"))
    nh = cm.groupBy(map_col).agg(F.sum("n_hk").alias("n_h"))
    return (cm.join(nh, map_col)
            .join(F.broadcast(weights.select(map_col, "w")), map_col))


def stratified_area_estimate(sample: DataFrame, weights: DataFrame,
                             map_col: str = "map_class",
                             ref_col: str = "ref_class",
                             z: float = Z95,
                             total_area: float | None = None,
                             check_coverage: bool = True) -> DataFrame:
    """Per-reference-class unbiased area proportion + SE + z·SE interval.

    ``sample``  — testing points carrying the map stratum (``map_col``)
    and the reference label (``ref_col``); ``weights`` — output of
    :func:`stratum_weights` (or any ``(map_col, w)`` frame, Σw = 1).

    Strata with a single sample point contribute 0 to the variance (the
    ``n_h − 1`` denominator is undefined; standard AREA2 behaviour is to
    require n_h ≥ 2 — we degrade gracefully instead of dividing by zero).

    Returns ``(class, p_hat, se, ci_lo, ci_hi[, area, area_se])`` —
    ``area`` columns only when ``total_area`` is given (the AREA2 console
    multiplies proportions by the map's total pixel area).
    """
    if check_coverage:
        _check_stratum_coverage(sample, weights, map_col)
    j = _joined_cells(sample, weights, map_col, ref_col)
    q = F.col("n_hk") / F.col("n_h")
    var_term = F.when(
        F.col("n_h") > 1,
        F.col("w") * F.col("w") * q * (F.lit(1.0) - q) / (F.col("n_h") - 1),
    ).otherwise(F.lit(0.0))
    out = (j.select(F.col(ref_col).alias("class"),
                    (F.col("w") * q).alias("term"), var_term.alias("vterm"))
           .groupBy("class")
           .agg(F.sum("term").alias("p_hat"),
                F.sqrt(F.sum("vterm")).alias("se")))
    out = out.select(
        "class", "p_hat", "se",
        F.greatest(F.col("p_hat") - z * F.col("se"), F.lit(0.0)).alias("ci_lo"),
        F.least(F.col("p_hat") + z * F.col("se"), F.lit(1.0)).alias("ci_hi"))
    if total_area is not None:
        out = out.select("*",
                         (F.col("p_hat") * total_area).alias("area"),
                         (F.col("se") * total_area).alias("area_se"))
    return out


def stratified_accuracy(sample: DataFrame, weights: DataFrame,
                        map_col: str = "map_class",
                        ref_col: str = "ref_class",
                        check_coverage: bool = True) -> DataFrame:
    """Stratified-estimation accuracies (the AREA2 console's other half):
    per class — user's accuracy ``Û_h`` with its SE, producer's accuracy
    ``P̂_k`` with its SE (Olofsson et al. 2014 eq. 7), and the overall
    accuracy ``Ô`` with its SE (eq. 5) repeated on every row (the
    shape a metrics CSV export wants; reference saves these to the
    metrics subfolder per ProjectWorkflow.md:258).

    Classes that appear only as reference labels (never mapped) get NULL
    user's accuracy; a mapped stratum whose sample is entirely
    misclassified gets user's accuracy 0 (observed, not missing).
    Classes never observed in the reference get NULL producer's
    accuracy (and NULL producer's SE).
    """
    if check_coverage:
        _check_stratum_coverage(sample, weights, map_col)
    j = _joined_cells(sample, weights, map_col, ref_col)
    q = F.col("n_hk") / F.col("n_h")
    # per-stratum diagonal: user's acc + overall-accuracy terms. Seed
    # from the stratum list (n_hh = 0 when no diagonal cell exists) so
    # an all-wrong stratum reads 0.0, never NULL.
    strata = (j.groupBy(F.col(map_col).alias("class"))
              .agg(F.first("n_h").alias("n_h"), F.first("w").alias("w_own")))
    dcell = (j.where(F.col(map_col) == F.col(ref_col))
             .select(F.col(map_col).alias("class"), "n_hk"))
    qd = F.coalesce(F.col("n_hk"), F.lit(0)) / F.col("n_h")
    # vdiag = the h = k term of the p̂_k variance sum, built with the
    # SAME expression shape as the vsum terms below (w·w·q·(1−q)/(n−1)),
    # NOT as (w·SE(Û))² — squaring the sqrt loses ulps, and the
    # off-diagonal subtraction vsum − vdiag must cancel exactly when a
    # class has no off-diagonal variance (else a should-be-zero
    # producer's SE surfaces as ~1e-9 noise; hypothesis-caught)
    vdiag_expr = F.when(
        F.col("n_h") > 1,
        F.col("w_own") * F.col("w_own") * qd * (F.lit(1.0) - qd)
        / (F.col("n_h") - 1)).otherwise(F.lit(0.0))
    diag = (strata.join(dcell, "class", "left")
            .select("class",
                    qd.alias("users_acc"),
                    F.when(F.col("n_h") > 1,
                           F.sqrt(qd * (F.lit(1.0) - qd) / (F.col("n_h") - 1)))
                    .otherwise(F.lit(0.0)).alias("users_se"),
                    (F.col("w_own") * qd).alias("oa_term"),
                    vdiag_expr.alias("vdiag"),
                    "w_own"))
    # p̂_k per reference class (producer's-accuracy denominator), plus its
    # full variance sum Σ_h W_h²·q_hk(1−q_hk)/(n_h−1) — the h = k term is
    # subtracted later via the (W_k·SE(Û_k))² identity
    var_term = F.when(
        F.col("n_h") > 1,
        F.col("w") * F.col("w") * q * (F.lit(1.0) - q) / (F.col("n_h") - 1),
    ).otherwise(F.lit(0.0))
    p_hat = (j.select(F.col(ref_col).alias("class"),
                      (F.col("w") * q).alias("term"), var_term.alias("vterm"))
             .groupBy("class").agg(F.sum("term").alias("p_hat"),
                                   F.sum("vterm").alias("vsum")))
    # V(Ô) = Σ_h W_h²·q_hh(1−q_hh)/(n_h−1) — the vdiag terms directly
    oa = diag.agg(F.sum("oa_term").alias("overall_acc"),
                  F.sqrt(F.sum("vdiag")).alias("overall_se"))
    # full outer: a class can be reference-only (users NULL) or map-only
    # (an all-wrong stratum — producers NULL, users an observed 0)
    pacc = F.when(F.col("p_hat") > 0,
                  F.col("w_own") * F.col("users_acc") / F.col("p_hat"))
    off_diag = F.greatest(F.col("vsum") - F.col("vdiag"), F.lit(0.0))
    p_se = F.sqrt(F.pow(F.lit(1.0) - pacc, 2) * F.col("vdiag")
                  + F.pow(pacc, 2) * off_diag) / F.col("p_hat")
    return (p_hat.join(diag, "class", "full")
            .crossJoin(F.broadcast(oa))
            .select("class", "users_acc", "users_se",
                    pacc.alias("producers_acc"),
                    F.when(F.col("p_hat") > 0, p_se).alias("producers_se"),
                    "overall_acc", "overall_se"))
