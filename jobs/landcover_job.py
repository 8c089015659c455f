"""spark-submit entry point for the full land-cover pipeline
(01composite → 03RFprimitives → 04generate_LC → 05accuracy → Step 6
AREA2), the reference workflow's actual production run
(/root/reference/ProjectWorkflow.md steps 1-6)::

    python tools/package.py                     # builds dist/kaza_lcms_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/kaza_lcms_spark.zip \\
        jobs/landcover_job.py --fixtures <fixture-dir> --out <table-root>

Builds the annual composite from the raw time series, trains per-class
RF primitives (concurrent fits), runs the zero-shuffle wide assemblage,
writes the LANDCOVER table through the checkpointing catalog (resumable:
a rerun skips committed partitions), and prints one JSON summary line
with accuracy and the AREA2 stratified area estimates — the metrics the
reference saves to its metrics subfolder.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True,
                    help="fixture dir with s2_timeseries/landcover_cells/ref_polygons parquet")
    ap.add_argument("--out", required=True, help="catalog root directory")
    ap.add_argument("--table", default="landcover")
    ap.add_argument("--n-per-class", type=int, default=100)
    ap.add_argument("--n-trees", type=int, default=20)
    ap.add_argument("--nodata", type=int, default=None,
                    help="class value excluded from the AREA2 stratification "
                         "(the AREA2 UI's no-data dialog)")
    ap.add_argument("--partitions-per-commit", type=int, default=4,
                    help="classes per snapshot commit in the catalog sink")
    ap.add_argument("--fail-after", type=int, default=None,
                    help="inject a crash after N snapshot commits "
                         "(resume testing: the rerun must skip exactly "
                         "the committed partitions)")
    ap.add_argument("--no-coverage-check", action="store_true",
                    help="accept strata without test points (biased-low "
                         "area proportions) instead of marking the AREA2 "
                         "block unavailable")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kaza_lcms_spark import workflow as W
    from kaza_lcms_spark.ml import primitives as P
    from kaza_lcms_spark.operators import composite_pipeline as CP
    from kaza_lcms_spark.operators import sampling as S
    from kaza_lcms_spark.sources.catalog import Catalog

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()

    # 01: composite features from the raw time series (fused mask →
    # indices → percentile+harmonic single hash-agg)
    import pandas as pd
    from pyspark.sql.types import LongType

    from kaza_lcms_spark.kernels import grid

    ts = spark.read.parquet(f"{args.fixtures}/s2_timeseries.parquet")
    lc = spark.read.parquet(f"{args.fixtures}/landcover_cells.parquet")
    comp = CP.build_composite(ts, harmonic_band=["nir", "swir1"])

    # no type hints: under spark-submit the string annotations from
    # `from __future__ import annotations` can't resolve function-local
    # imports like pd; hint-less pandas_udf defaults to SCALAR
    @F.pandas_udf(LongType())
    def parent12(cell):
        return pd.Series(grid.parent(cell.to_numpy(), 12))

    labeled = (comp.withColumn("p12", parent12(F.col("cell_id")))
               .join(lc.select(F.col("cell_id").alias("p12"), "LANDCOVER"), "p12")
               .drop("p12").dropna())
    feature_cols = ([c for c in labeled.columns
                     if c.startswith(("p10_", "p25_", "p50_", "p75_", "p90_"))]
                    + [c for c in labeled.columns
                       if c.startswith(("amplitude", "phase"))])

    # 02/03: stratified sample, split, concurrent per-class RF fits
    sampled = S.stratified_topk(labeled, "LANDCOVER", "cell_id",
                                args.n_per_class)
    train, test = S.train_test_split(sampled, "cell_id", 0.8)
    train = train.cache(); test = test.cache()

    # 04: wide zero-shuffle inference + argmax assemblage
    wide, cls = P.primitives_wide(train, labeled, feature_cols,
                                  n_trees=args.n_trees)
    landcover = P.assemble_max_prob_wide(wide, cls).cache()

    # sink through the checkpointing catalog, partitioned by class
    # (resumable: a rerun skips committed partitions)
    cat = Catalog(args.out)
    res = cat.write_partitioned(
        spark, landcover, args.table, "LANDCOVER",
        partitions_per_commit=args.partitions_per_commit,
        fail_after=args.fail_after)
    n = cat.read_table(spark, args.table).count()
    # reclaim any orphaned files a previously crashed attempt left
    # behind (invisible to readers; vacuum keeps every snapshot-
    # referenced file, so time travel is unaffected)
    vac = cat.vacuum(args.table)

    # 05 + Step 6: accuracy + AREA2 stratified area estimation. A
    # coverage mismatch (a predicted stratum with zero test points —
    # plausible for a rarely-predicted class under a small test split)
    # must not lose the whole summary AFTER the catalog write: mark the
    # AREA2 block unavailable and still emit the JSON line.
    accs, overall = W.score_accuracy(landcover, test)
    summary = {
        "job": "landcover",
        "rows_committed": n,
        "partitions_written": res["written"],
        "partitions_skipped": res["skipped"],
        "orphan_bytes_reclaimed": vac["bytes_reclaimed"],
        "n_features": len(feature_cols),
        "n_train": train.count(), "n_test": test.count(),
        "overall_acc": round(overall, 4),
    }
    try:
        est, acc = W.score_area(landcover, test, nodata=args.nodata,
                                check_coverage=not args.no_coverage_check)
        oa = acc.select("overall_acc", "overall_se").first()
        summary.update({
            "area_estimates": [
                {"class": r["class"], "p_hat": round(r["p_hat"], 6),
                 "se": round(r["se"], 6), "ci_lo": round(r["ci_lo"], 6),
                 "ci_hi": round(r["ci_hi"], 6)}
                for r in est.orderBy("class").collect()],
            "stratified_overall_acc": round(oa["overall_acc"], 6),
            "stratified_overall_se": round(oa["overall_se"], 6),
        })
    except ValueError as ex:
        summary.update({"area_estimates": None,
                        "area_unavailable_reason": str(ex)})
    summary["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
