"""Per-query isolation bench (guide §1.4): times individual engine
queries with the SAME inputs/actions as bench.py, selectable from argv,
so optimization rounds can measure one operator without paying the full
suite. bench.py itself is FROZEN for driver measurement; numbers cited
in OPTIMIZATION_r*.md come from here unless stated otherwise.

Usage:
    python bench_extra.py [query ...]          # default: all
    KAZA_BENCH_REPEAT=4 python bench_extra.py knn caption

Queries accept the bench.py names plus a few extra stage-isolation
probes (suffix `_noop` runs the dataframe through the noop sink so the
full row set is computed without the collect/count shortcut).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("KAZA_BENCH_IMAGES", "200000"))
    repeat = int(os.environ.get("KAZA_BENCH_REPEAT", "3"))

    from pyspark.sql import functions as F

    from kaza_lcms_spark import datagen
    from kaza_lcms_spark.session import get_spark
    from kaza_lcms_spark.operators import knn as KNN
    from kaza_lcms_spark.operators import spatial_join as SJ
    from kaza_lcms_spark.operators import composite as C
    from kaza_lcms_spark.operators import composite_pipeline as CP
    from kaza_lcms_spark.sources import images as IMG
    import __spark_entry__ as E

    fix_dir = datagen.ensure_fixtures(n_images)
    spark = get_spark(app_name="kaza-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 32))
    sc = spark.sparkContext

    # same warmup as bench.py
    spark.range(1000).select(F.sum("id")).collect()
    warm = spark.read.parquet(f"{fix_dir}/images.parquet").limit(2048)
    widx = SJ.load_polygon_index_from_fixture()
    SJ.zonal_stats(SJ.assign_images_fused(spark, warm.repartition(cpus), widx)).collect()
    IMG.decode_stats(warm).count()
    wpts = SJ.with_cell(SJ.with_footprint(warm.select("image_id", "phash")), level=10)
    KNN.knn_per_cell(wpts, k=3).count()
    KNN.caption_knn_per_cell(
        SJ.with_cell(SJ.with_footprint(warm.select("image_id", "caption")), level=10),
        k=3).count()

    imgs = spark.read.parquet(f"{fix_dir}/images.parquet")
    idx = SJ.load_polygon_index_from_fixture()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ts_df = spark.read.parquet(f"{fix_dir}/s2_timeseries.parquet")
    n_flag = int(os.environ.get("KAZA_BENCH_FLAG_IMAGES", "5000000"))
    ids_df = (spark.range(n_flag).repartition(cpus * 3)
              .select(F.format_string("img_%012d", F.col("id")).alias("image_id")))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def knn_pts():
        return SJ.with_cell(SJ.with_footprint(imgs.select("image_id", "phash")),
                            level=10)

    def cap_pts():
        return SJ.with_cell(SJ.with_footprint(imgs.select("image_id", "caption")),
                            level=10)

    queries = {
        "tile_assign_images":
            lambda: SJ.zonal_counts_fused(spark, ids_df, idx).collect(),
        "tile_assign_corpus":
            lambda: SJ.zonal_stats(SJ.assign_images_fused(spark, imgs, idx)).collect(),
        "decode_images":
            lambda: IMG.decode_stats(imgs).agg(
                F.count(F.lit(1)), F.avg("mean_px")).collect(),
        "decode_images_noop": lambda: noop(IMG.decode_stats(imgs)),
        "knn_per_cell_phash": lambda: KNN.knn_per_cell(knn_pts(), k=5).count(),
        "knn_input_noop": lambda: noop(knn_pts()),
        "caption_knn_per_cell":
            lambda: KNN.caption_knn_per_cell(cap_pts(), k=5).count(),
        "distance_pairs": lambda: E.q_distance_pairs(spark, sf_dir).count(),
        "pct_composite": lambda: E.q_pct_composite(spark, sf_dir).collect(),
        "pct_composite_approx":
            lambda: C.percentile_composite_approx(
                li, "l_returnflag", ["l_quantity"]).collect(),
        "minhash": lambda: E.q_minhash_signatures(spark, sf_dir).count(),
        "ann_topk": lambda: E.q_cosine_topk_blocked(spark, sf_dir).count(),
        "composite_build": lambda: CP.build_composite(ts_df).count(),
        "composite_build_approx":
            lambda: CP.build_composite(ts_df, approx=True).count(),
    }

    sel = sys.argv[1:] or list(queries)
    out = {}
    for name in sel:
        fn = queries[name]
        best, samples = float("inf"), []
        for _ in range(repeat):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        sc.setJobDescription(None)
        out[name] = {"best": round(best, 3), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"metric": "bench_extra", "queries": out, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
