"""Skew-proof probe (r3 verdict item #5): the north rule's stated skew
case — one border/river cell holding ~20% of all points.

Synthesizes a deterministic skewed fixture (1 hot cell with 20% of the
corpus + 2,000 cold cells), runs per-cell kNN with the salting planner
ON (default threshold → hot cell takes the broadcast-items/salted-query
path) and OFF (threshold = ∞ → one groupBy task owns the whole hot
cell), asserts both produce the identical result multiset at this
scale, and records the wall-clock delta. A zonal hash-agg over the same
skewed input is timed alongside to document why THAT shape needs no
salting (map-side partial aggregation bounds hot-key state).

Appends a markdown section to BENCH/BASELINE.md. Run AFTER
tools/scaling.py (it overwrites the file).

Usage: python tools/skew_probe.py [n_points]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

HOT_CELL = 123_456_789
N_COLD_CELLS = 2_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    from pyspark.sql import functions as F

    from kaza_lcms_spark.operators import knn as KNN
    from kaza_lcms_spark.session import get_spark

    spark = get_spark(app_name="skew-probe", master="local[32]",
                      shuffle_partitions=64)
    pts = (spark.range(n).select(
        F.col("id").alias("image_id"),
        F.when(F.col("id") % 5 == 0, F.lit(HOT_CELL))
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_COLD_CELLS)))
         .alias("cell_id"),
        F.xxhash64((F.col("id") * 7919).cast("long")).alias("phash"),
    ).cache())
    pts.count()
    hist = pts.groupBy("cell_id").count().orderBy(F.desc("count")).limit(1).collect()
    hot_rows = hist[0]["count"]

    def run(mode: str):
        thr = 2**40 if mode == "unsalted" else 20_000
        # "mega": broadcast_cap below the hot-cell size forces the
        # block-grid join path (hash-chunked items × salted queries)
        cap = (hot_rows - 1) if mode == "mega" else 20_000_000
        out = KNN.knn_per_cell(pts, k=5, salt_threshold=thr,
                               salt_buckets=16, broadcast_cap=cap,
                               mega_chunk_rows=max(hot_rows // 8, 1))
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(image_id, neighbor_id, hamming))")
             .alias("checksum")).collect()[0]

    # output parity at probe scale, then timings (warm second arm first)
    r_on, r_off, r_mega = run("salted"), run("unsalted"), run("mega")
    assert tuple(r_on) == tuple(r_off), f"salting changed results: {r_on} vs {r_off}"
    assert tuple(r_mega) == tuple(r_off), f"mega path changed results: {r_mega} vs {r_off}"

    def best(fn, reps):
        b = float("inf")
        for _ in range(reps):
            t0 = time.time(); fn(); b = min(b, time.time() - t0)
        return b

    # same best-of arms for all modes — an extra rep for one side would
    # bias the published speedup (cf. bench.py's rf fairness rule)
    t_on = best(lambda: run("salted"), 2)
    t_off = best(lambda: run("unsalted"), 2)
    t_mega = best(lambda: run("mega"), 2)

    def zonal():
        return pts.groupBy("cell_id").agg(
            F.count(F.lit(1)), F.avg("phash"), F.min("phash"),
            F.max("phash")).count()

    zonal()
    t_zonal = best(zonal, 3)

    lines = [
        "",
        f"## Skew proof: hot-cell kNN, salting on vs off ({n:,} points, local[32])",
        "",
        f"North-rule skew case: one river/border cell holds {hot_rows:,}",
        f"points ({100 * hot_rows / n:.0f}% of the corpus); {N_COLD_CELLS:,} cold cells share",
        "the rest. Identical output multiset asserted (count + value",
        "checksum) before timing (`python tools/skew_probe.py`):",
        "",
        "| plan | wall sec | hot-cell shape |",
        "|---|---|---|",
        f"| salted (threshold 20k, 16 buckets) | {t_on:.2f} | "
        "16 tasks × 1/16th of the queries vs broadcast items |",
        f"| unsalted (groupBy path) | {t_off:.2f} | "
        "1 task owns the whole hot cell |",
        f"| mega block-grid (cap < hot size, 8 chunks × 16 salts) | {t_mega:.2f} | "
        "no broadcast: hash-chunked items joined to salted queries |",
        f"| zonal hash-agg, same skewed input | {t_zonal:.2f} | "
        "partial agg (map-side combine) — salting unnecessary |",
        "",
        f"Salting bounds the straggler: {t_off / t_on:.1f}× wall-clock at one",
        "hot cell; the gap widens linearly with hot-cell share since the",
        "unsalted arm serializes the O(n²) cell kernel on one core while",
        "the salted arm splits its query dimension across the cluster.",
        "The zonal row documents the complementary case: aggregation",
        "shapes with algebraic combiners need no salting — partial",
        "aggregation caps per-task hot-key state before the shuffle.",
        "The mega row is the >20M-row fallback (broadcast_cap forced",
        "below the hot-cell size here): exact, broadcast-free, output",
        "checksum-identical to both other plans.",
    ]
    with open("/root/repo/BENCH/BASELINE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"salted {t_on:.2f}s, unsalted {t_off:.2f}s "
          f"({t_off / t_on:.1f}x), mega {t_mega:.2f}s, "
          f"zonal {t_zonal:.2f}s, hot rows {hot_rows}")
    spark.stop()


if __name__ == "__main__":
    main()
