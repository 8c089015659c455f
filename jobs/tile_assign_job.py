"""spark-submit entry point for the flagship tile-assignment job.

Deployment shape required by the north rule: pure-Python engine shipped
via ``--py-files`` (no cluster-side install), e.g.::

    python tools/package.py                     # builds dist/kaza_lcms_spark.zip
    spark-submit --master local[8] \
        --py-files dist/kaza_lcms_spark.zip \
        jobs/tile_assign_job.py --images <parquet> --out <table-root> [--resume]

Reads the contract-shaped images table, runs the fused footprint → cell →
PIP assignment, writes per-unit partitions through the checkpointing
catalog (resumable mid-tiling), and prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True, help="catalog root directory")
    ap.add_argument("--table", default="tiles")
    ap.add_argument("--partitions-per-commit", type=int, default=4)
    args = ap.parse_args()

    # spark-submit provides the session; engine modules come via --py-files
    from pyspark.sql import SparkSession

    from kaza_lcms_spark.operators import spatial_join as SJ
    from kaza_lcms_spark.sources.catalog import Catalog

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    imgs = spark.read.parquet(args.images)
    idx = SJ.load_polygon_index_from_fixture()
    assigned = SJ.assign_images_fused(spark, imgs, idx)
    cat = Catalog(args.out)
    res = cat.write_partitioned(spark, assigned, args.table, "unit_id",
                                partitions_per_commit=args.partitions_per_commit)
    n = cat.read_table(spark, args.table).count()
    print(json.dumps({
        "job": "tile_assign", "rows_committed": n,
        "partitions_written": res["written"], "partitions_skipped": res["skipped"],
        "wall_s": round(time.time() - t0, 2),
        "lineage": [{"partition": l.partition, "n_rows": l.n_rows,
                     "wall_s": l.wall_s} for l in cat.lineage(args.table)],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
