"""Two-phase spatial join: coarse cell prefilter → broadcast R-tree PIP.

Re-grounds the reference's raster↔vector joins (sig-gis/kaza-lcms):
``sampleRegions`` (src/utils/sampling.py:148-153), ``paint``
(src/utils/s2process.py:172), ``filterBounds`` (src/utils/s2process.py:18),
``clip`` (src/misc/sentinel1.py:59) — all are point/footprint-vs-polygon
containment joins that GEE executes server-side over tiles.

Physical strategy (BASELINE.json::north_star):

1. **Driver-side plan construction** — compute the polygon set's cell cover
   at a coarse level (kernels.grid.cover_polygon) → a partition-pruning /
   prefilter predicate. At 100 TB this is what turns a full-table scan into
   a scan of only the AOI's partitions.
2. **Narrow map, no shuffle** — build a PolygonIndex (STR R-tree over
   ring bboxes) once on the driver, broadcast it, probe it with vectorized
   point batches inside ``mapInPandas``. Containment assignment therefore
   costs ZERO shuffles: it is a map-side broadcast join, the same shape
   Catalyst picks for small dimension tables, but with an R-tree instead
   of a hash table. Skewed cells (borders/rivers) cannot hurt a narrow
   map — skew handling matters only for the *keyed* operators downstream
   (distance join / kNN), which salt explicitly.
3. **Exact PIP** — even-odd ray casting (kernels.geom.points_in_polygon),
   lowest-unit_id tie-break on shared borders so output is row-for-row
   deterministic (reference parity requirement).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from ..kernels import geom, grid
from .. import datagen

#: coarse grid level used as prefilter/shuffle key. Level 10 cells are
#: ~0.35° — small enough to prune, big enough that polygon covers stay tiny.
COARSE_LEVEL = 10
#: fine level for per-image cell ids (~2.7 km at l=14 over lat band).
FINE_LEVEL = 14


# ----------------------------------------------------------- footprint & cell

def image_index_col(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Parse the numeric index out of ``img_%012d`` ids — JVM-side only."""
    return df.withColumn("img_idx", F.substring(F.col(id_col), 5, 12).cast("long"))


def parse_image_idx(ids: pd.Series) -> np.ndarray:
    """Vectorized ``img_%012d`` → int64: fixed-width byte view + digit dot
    product (~100 ns/row vs ~2 µs/row for pandas .str parsing — the id
    parse is on the flagship hot path at 10⁶+ rows/batch)."""
    a = np.asarray(ids, dtype="S16")
    if a.dtype.itemsize != 16:          # unexpected id shape → slow path
        return ids.str.slice(4).astype(np.int64).to_numpy()
    b = np.frombuffer(a.tobytes(), dtype=np.uint8).reshape(len(a), 16)
    digits = (b[:, 4:16] - ord("0")).astype(np.int64)
    powers = (10 ** np.arange(11, -1, -1)).astype(np.int64)
    return digits @ powers


def _parse_arrow_ids(arr) -> np.ndarray:
    """``img_%012d`` Arrow string column → int64 indices with zero
    Python-object materialization: all ids are fixed 16-byte strings, so
    the Arrow offsets are uniform and the data buffer views directly as
    an (n, 16) uint8 matrix for the digit dot product. Ragged or
    unexpected inputs fall back to the object path (parse_image_idx —
    identical values)."""
    a = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
    bufs = a.buffers()
    if a.null_count == 0 and len(bufs) == 3 and bufs[2] is not None:
        off = np.frombuffer(bufs[1], dtype=np.int32)[
            a.offset: a.offset + len(a) + 1].astype(np.int64)
        if len(off) > 1 and (np.diff(off) == 16).all():
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            view = data[off[0]:off[-1]].reshape(-1, 16)
            digits = (view[:, 4:16] - ord("0")).astype(np.int64)
            powers = (10 ** np.arange(11, -1, -1)).astype(np.int64)
            return digits @ powers
    return parse_image_idx(pd.Series(a.to_pylist()))


def with_footprint(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Attach deterministic (lon, lat) center derived from the image id.

    The input table is contract-shaped (no geo columns,
    BASELINE.json::input_hint); the footprint is a pure function of the id
    (datagen.footprint_from_ids), computed in a vectorized Arrow batch UDF.

    The ``img_%012d`` index is parsed IN THE JVM (substring+cast,
    codegen) so the UDF receives an int64 column — Arrow→pandas for
    int64 is a zero-copy view, while the id strings would materialize
    one Python object per row on every recompute of this chain (the
    per-cell kNN derives from it three times per call).
    """
    @F.pandas_udf("lon double, lat double")
    def fp(pidx: pd.Series) -> pd.DataFrame:
        lon, lat = datagen.footprint_from_ids(pidx.to_numpy())
        return pd.DataFrame({"lon": lon, "lat": lat})

    idx_col = F.substring(F.col(id_col), 5, 12).cast("long")
    return (df.withColumn("_fp", fp(idx_col))
              .withColumn("lon", F.col("_fp.lon"))
              .withColumn("lat", F.col("_fp.lat"))
              .drop("_fp"))


_SPREAD_MASKS = (0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
                 0x3333333333333333, 0x5555555555555555)
_SPREAD_SHIFTS = (16, 8, 4, 2, 1)


def attach_cell(df: DataFrame, level: int,
                lon_col: str = "lon", lat_col: str = "lat",
                out_col: str = "cell_id") -> DataFrame:
    """Attach the Morton cell id at `level` as pure JVM column algebra —
    bit-identical to kernels.grid.encode (same quantize → clip → magic
    interleave arithmetic, all exact IEEE ops: add/div/mul/floor; the
    oracle-gated cell_morton query proves the SQL form of this formula
    against the numpy kernel; test_cell_expr_matches_numpy_encode covers
    clip edges). Replaces the old pandas-UDF encode: the cell attach is
    on every spatial input chain and a codegen expression costs no
    Python worker round-trip.

    Each spread step lands in its OWN projection (withColumn), because
    the step references its input twice (v | v<<s): inlining the chain
    as one Column doubles the subtree per step — 2⁵× the upstream
    expression — which was measured to push the distance-join stage into
    interpreted evaluation (0.69 s → 1.0 s). Step-wise temp columns keep
    the tree linear; Catalyst leaves such projects uncollapsed
    (CollapseProject skips duplicating non-cheap expressions)."""
    nf = float(1 << level)
    ax, ay = f"_mx_{out_col}", f"_my_{out_col}"
    qx = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(nf))
    qy = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(nf))
    df = df.withColumn(
        ax, F.least(F.greatest(qx, F.lit(0.0)), F.lit(nf - 1.0)).cast("long")
            .bitwiseAND(F.lit(0xFFFFFFFF))) \
           .withColumn(
        ay, F.least(F.greatest(qy, F.lit(0.0)), F.lit(nf - 1.0)).cast("long")
            .bitwiseAND(F.lit(0xFFFFFFFF)))
    for s, m in zip(_SPREAD_SHIFTS, _SPREAD_MASKS):
        df = df.withColumn(
            ax, F.col(ax).bitwiseOR(F.shiftleft(F.col(ax), s))
                .bitwiseAND(F.lit(m))) \
               .withColumn(
            ay, F.col(ay).bitwiseOR(F.shiftleft(F.col(ay), s))
                .bitwiseAND(F.lit(m)))
    morton = F.col(ax).bitwiseOR(F.shiftleft(F.col(ay), 1))
    return (df.withColumn(out_col,
                          F.shiftleft(morton, 5).bitwiseOR(F.lit(level)))
            .drop(ax, ay))


def with_cell(df: DataFrame, level: int = FINE_LEVEL,
              lon_col: str = "lon", lat_col: str = "lat",
              out_col: str = "cell_id") -> DataFrame:
    """Attach the Morton cell id at `level` (JVM column algebra)."""
    return attach_cell(df, level, lon_col, lat_col, out_col)


# --------------------------------------------------------------- poly loading

def load_polygon_index(polys_df: DataFrame,
                       id_col: str = "unit_id") -> geom.PolygonIndex:
    """Collect a (small) polygon table to the driver and build the R-tree.

    Polygon sets in this workload are O(10–10^3) rows (AOI units,
    reference polygons) — always broadcastable; the 10^12-row side is the
    images table, which never moves.
    """
    rows = polys_df.select(id_col, "ring_xs", "ring_ys").collect()
    return geom.PolygonIndex(
        [r[id_col] for r in rows],
        [np.asarray(r["ring_xs"]) for r in rows],
        [np.asarray(r["ring_ys"]) for r in rows],
    )


def load_polygon_index_from_fixture() -> geom.PolygonIndex:
    """PolygonIndex over the deterministic AOI fixture polygons (in-memory,
    no parquet round-trip) — the broadcast side of the flagship join."""
    t = datagen.generate_aoi_polygons()
    return geom.PolygonIndex(
        t["unit_id"].to_numpy(),
        [np.asarray(r) for r in t["ring_xs"].to_pylist()],
        [np.asarray(r) for r in t["ring_ys"].to_pylist()],
    )


def polygon_cover_cells(index: geom.PolygonIndex, level: int = COARSE_LEVEL) -> np.ndarray:
    """Union of coarse cells intersecting any polygon (driver-side)."""
    cells = [grid.cover_polygon(rx, ry, level)
             for rx, ry in zip(index.rings_x, index.rings_y)]
    return np.unique(np.concatenate(cells)) if cells else np.empty(0, np.int64)


# ---------------------------------------------------------------- tile assign

def assign_tiles(spark: SparkSession, points_df: DataFrame,
                 index: geom.PolygonIndex,
                 lon_col: str = "lon", lat_col: str = "lat",
                 keep_cols: tuple[str, ...] = ("image_id",),
                 prefilter: bool = True,
                 first_match: bool = True) -> DataFrame:
    """Point/footprint → polygon containment join (the flagship operator).

    Returns keep_cols + (lon, lat, cell_id, unit_id); rows not inside any
    polygon are dropped (inner-join semantics, matching ``sampleRegions``
    dropping points off the raster/region).
    """
    bidx = spark.sparkContext.broadcast(index)

    df = with_cell(points_df, FINE_LEVEL, lon_col, lat_col)
    if prefilter:
        cover = polygon_cover_cells(index, COARSE_LEVEL)
        bset = spark.sparkContext.broadcast(np.sort(cover))

        @F.pandas_udf("boolean")
        def in_cover(cell: pd.Series) -> pd.Series:
            coarse = grid.parent(cell.to_numpy(), COARSE_LEVEL)
            return pd.Series(np.isin(coarse, bset.value, assume_unique=False))

        df = df.where(in_cover(F.col("cell_id")))

    cols = list(keep_cols) + [lon_col, lat_col, "cell_id"]
    fields = [df.schema[c] for c in cols]
    out_schema = StructType(fields + [StructField("unit_id", LongType())])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_local = bidx.value
        for b in batches:
            if len(b) == 0:
                continue
            pi, units = idx_local.probe(
                b[lon_col].to_numpy(), b[lat_col].to_numpy(), first_match=first_match
            )
            out = b.iloc[pi].reset_index(drop=True)
            out["unit_id"] = units
            yield out

    return df.select(*cols).mapInPandas(probe, out_schema)


def assign_tiles_codegen(points_df: DataFrame, index: geom.PolygonIndex,
                         lon_col: str = "lon", lat_col: str = "lat",
                         out_col: str = "unit_id") -> DataFrame:
    """Second physical strategy for the PIP join: COMPILE the polygon set
    into a Catalyst CASE chain of half-plane tests (convex polygons only)
    — the whole join runs inside whole-stage codegen, zero Python, zero
    broadcast objects. Pick this when the polygon set is small (~≤100
    convex rings; expression size grows linearly); fall back to the
    broadcast R-tree mapInPandas probe otherwise. Tie-break identical to
    PolygonIndex.probe (lowest unit_id wins; tested equivalent).

    Measured (32-core VM, 5M rows, 12 polygons): codegen 1.27M rows/s vs
    R-tree probe 1.47M rows/s — the Arrow-batched numpy probe already
    saturates; codegen wins only where Python worker startup or IPC is
    the constraint, and loses as the CASE chain grows with |polygons|."""
    from ..plans import oracles as O

    whens = []
    order = sorted(range(len(index.unit_ids)), key=lambda k: index.unit_ids[k])
    for k in order:
        xs, ys = index.rings_x[k], index.rings_y[k]
        # drop consecutive collinear vertices, then require convex CCW
        keep = []
        n = len(xs)
        for i in range(n):
            x0, y0 = xs[i - 1], ys[i - 1]
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
            cr = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            if abs(cr) > 1e-9:   # near-collinear (midpoint FP noise) drops
                keep.append(i)
        cxs, cys = xs[keep], ys[keep]
        m = len(cxs)
        for i in range(m):
            x1, y1 = cxs[i], cys[i]
            x2, y2 = cxs[(i + 1) % m], cys[(i + 1) % m]
            x3, y3 = cxs[(i + 2) % m], cys[(i + 2) % m]
            if (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) <= 0:
                raise ValueError(
                    f"unit {index.unit_ids[k]} is not strictly convex CCW — "
                    "use assign_tiles (R-tree probe) instead")
        whens.append(
            f"WHEN {O.convex_inside_sql(lon_col, lat_col, cxs, cys)} "
            f"THEN {int(index.unit_ids[k])}L")
    case = "CASE " + " ".join(whens) + " ELSE NULL END"
    return (points_df.withColumn(out_col, F.expr(case))
            .where(F.col(out_col).isNotNull()))


def assign_images_fused(spark: SparkSession, images_df: DataFrame,
                        index: geom.PolygonIndex,
                        id_col: str = "image_id",
                        extra_cols: tuple[str, ...] = (),
                        prefilter: bool = True,
                        fine_level: int = FINE_LEVEL) -> DataFrame:
    """Single-pass flagship join: footprint derivation + cell encode +
    coarse-cover prefilter + exact R-tree PIP in ONE mapInArrow kernel —
    one Arrow round-trip instead of four chained Python stages, and no
    pandas object materialization on either side of the boundary (the
    fixed-width ids parse zero-copy from the Arrow data buffer; kept
    rows are re-emitted with Arrow ``take``). This is the physical plan
    the 100 TB path wants: a narrow map over the scan with zero
    shuffles; per-batch numpy cost is ~1 ms / 4k rows, so the pipeline
    is I/O-bound, exactly as it should be.
    """
    bidx = spark.sparkContext.broadcast(index)
    cover = polygon_cover_cells(index, COARSE_LEVEL) if prefilter else None
    bcov = spark.sparkContext.broadcast(np.sort(cover)) if prefilter else None

    cols = [id_col, *extra_cols]
    fields = [images_df.schema[c] for c in cols]
    out_schema = StructType(fields + [
        StructField("lon", DoubleType()), StructField("lat", DoubleType()),
        StructField("cell_id", LongType()), StructField("unit_id", LongType()),
    ])
    out_names = [f.name for f in out_schema.fields]

    def kernel(batches):
        import pyarrow as pa

        ix = bidx.value
        cov = bcov.value if bcov is not None else None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lon, lat = datagen.footprint_from_ids(
                _parse_arrow_ids(rb.column(0)))
            cell = grid.encode(lon, lat, fine_level)
            keep = np.arange(rb.num_rows)
            if cov is not None:
                m = np.isin(grid.parent(cell, COARSE_LEVEL), cov)
                keep = keep[m]
                lon, lat, cell = lon[m], lat[m], cell[m]
            pi, units = ix.probe(lon, lat)
            sel = pa.array(keep[pi].astype(np.int64))
            arrays = [rb.column(i).take(sel) for i in range(rb.num_columns)]
            arrays += [pa.array(lon[pi]), pa.array(lat[pi]),
                       pa.array(cell[pi]), pa.array(units)]
            yield pa.RecordBatch.from_arrays(arrays, out_names)

    return images_df.select(*cols).mapInArrow(kernel, out_schema)


def zonal_counts_fused(spark: SparkSession, images_df: DataFrame,
                       index: geom.PolygonIndex,
                       id_col: str = "image_id",
                       prefilter: bool = True,
                       fine_level: int = FINE_LEVEL) -> DataFrame:
    """Flagship zonal aggregation with MANUAL map-side combine: the fused
    kernel emits per-batch partial (unit_id, n) aggregates (≤ |polygons|
    rows per batch instead of per-row output through Arrow), and a tiny
    final groupBy sums the partials. At 10¹² rows this is the difference
    between shuffling 10¹² rows and shuffling |batches|·|units| rows.

    Two r6 boundary optimizations (the kernel's numpy work is ~0.1 s of
    a 2.5 s query; the JVM→Python Arrow boundary is the cost):
    * the id string is parsed to its int64 index IN THE JVM
      (substring+cast, codegen) so 8-byte ints cross the boundary
      instead of 16-byte strings (measured −0.35 s / 5M rows; malformed
      ids now raise Spark's ANSI cast error instead of taking the
      Python fallback parse — the input contract guarantees the shape);
    * the kernel stage coalesces to one task per core: per-task Python
      round-trip overhead dominates a map whose output is ≤|units| rows,
      so 96 input partitions × ~200 ms beats 32 × the same (measured
      −0.6 s). coalesce never shuffles and never increases partitions."""
    bidx = spark.sparkContext.broadcast(index)
    cover = polygon_cover_cells(index, COARSE_LEVEL) if prefilter else None
    bcov = spark.sparkContext.broadcast(np.sort(cover)) if prefilter else None

    out_schema = StructType([
        StructField("unit_id", LongType()), StructField("n", LongType()),
    ])

    def kernel(batches):
        # mapInArrow, not mapInPandas: converting 10⁶+ ids into pandas
        # objects costs more than every numpy stage of the kernel
        # combined; the int64 column views as numpy zero-copy.
        import pyarrow as pa

        ix = bidx.value
        cov = bcov.value if bcov is not None else None
        acc: dict[int, int] = {}
        for rb in batches:
            if rb.num_rows == 0:
                continue
            pidx = rb.column(0).to_numpy(zero_copy_only=False)
            lon, lat = datagen.footprint_from_ids(pidx)
            if cov is not None:
                m = np.isin(grid.parent(grid.encode(lon, lat, fine_level),
                                        COARSE_LEVEL), cov)
                lon, lat = lon[m], lat[m]
            _, units = ix.probe(lon, lat)
            u, c = np.unique(units, return_counts=True)
            for uu, cc in zip(u, c):
                acc[int(uu)] = acc.get(int(uu), 0) + int(cc)
        if acc:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(acc), type=pa.int64()),
                 pa.array([int(v) for v in acc.values()], type=pa.int64())],
                ["unit_id", "n"])

    # unconditional: coalesce never increases the partition count, and
    # probing src.rdd.getNumPartitions() first costs a full extra
    # physical-planning pass per invocation
    src = images_df.select(
        F.substring(F.col(id_col), 5, 12).cast("long").alias("_idx")) \
        .coalesce(spark.sparkContext.defaultParallelism)
    partials = src.mapInArrow(kernel, out_schema)
    return partials.groupBy("unit_id").agg(F.sum("n").alias("n"))


def zonal_stats(assigned: DataFrame, value_cols: tuple[str, ...] = (),
                unit_col: str = "unit_id") -> DataFrame:
    """Per-unit aggregate over assigned rows (reference analogs:
    reduceRegion(mean) src/misc/sentinel1.py:88, area-by-class
    src/misc/pt_calc_disprop.py:23-32). Partial aggregation (map-side
    combine) comes free from Catalyst hash-agg, so skewed units cost one
    hot reducer only for the tiny final combine."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        aggs += [F.avg(c).alias(f"avg_{c}"), F.sum(c).alias(f"sum_{c}")]
    return assigned.groupBy(unit_col).agg(*aggs)


# -------------------------------------------------------------- distance join

def distance_join(points_df: DataFrame, radius_deg: float,
                  id_col: str = "pt_id",
                  lon_col: str = "lon", lat_col: str = "lat",
                  cell_level: int | None = None,
                  salt: int = 1) -> DataFrame:
    """All unordered pairs (a < b) within planar `radius_deg` degrees.

    Re-grounds the reference's ``ee.Join.saveAll`` withinDistance self-join
    (src/utils/sampling.py:12-28). Physical plan: pick a cell level whose
    cell size ≥ radius → replicate each point to its 3×3 neighbor cells
    (halo) → equi-join home×replica on cell → exact distance filter →
    dedupe pair (a<b keeps one orientation; same pair may match in several
    cells, distinct() collapses). The shuffle key is the cell id; `salt`
    > 1 splits every cell's LEFT rows into `salt` hash buckets and
    replicates the right (halo) side once per bucket, so no task owns a
    whole hot river/border cell — the explicit planner-side skew lever
    (AQE skew-join also covers this at runtime). Results are identical
    for any salt (tested); cost is a ×salt replication of the halo side.
    """
    if cell_level is None:
        # largest level whose cell height >= radius (lat degrees)
        cell_level = max(0, min(24, int(np.floor(np.log2(180.0 / max(radius_deg, 1e-9))))))

    lvl = cell_level

    # NOTE: this encode stays a pandas UDF deliberately (r6): the JVM
    # morton algebra (attach_cell) was measured SLOWER here (0.69 s ->
    # 1.1 s at sf0.1) — the inner join's inferred isnotnull(cell) filter
    # gets pushed through the projections and re-inlines the whole
    # spread chain over the derived lon/lat into a ~16 KB per-row filter
    # expression; the Python-eval node is a pushdown barrier that keeps
    # the plan small. with_cell (kNN path) has the footprint UDF as its
    # barrier, so the JVM encode wins there.
    @F.pandas_udf(LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.encode(lon.to_numpy(), lat.to_numpy(), lvl))

    pts = points_df.select(
        F.col(id_col).alias("pid"), F.col(lon_col).alias("px"), F.col(lat_col).alias("py")
    ).withColumn("home", enc(F.col("px"), F.col("py")))

    nbr_schema = StructType([
        StructField("pid", pts.schema["pid"].dataType),
        StructField("px", DoubleType()), StructField("py", DoubleType()),
        StructField("cell", LongType()),
    ])

    def replicate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            nb = grid.neighbors(b["home"].to_numpy())  # (n, 9)
            n, k = nb.shape
            rep = b.loc[b.index.repeat(k)].reset_index(drop=True)
            rep["cell"] = nb.ravel()
            rep = rep.drop_duplicates(subset=["pid", "cell"])
            yield rep[["pid", "px", "py", "cell"]]

    right = (pts.mapInPandas(replicate, nbr_schema)
             .withColumnRenamed("pid", "pid_b")
             .withColumnRenamed("px", "px_b").withColumnRenamed("py", "py_b"))
    left = pts.withColumnRenamed("home", "cell")
    if salt > 1:
        left = left.withColumn("bkt", F.pmod(F.xxhash64("pid"), F.lit(salt)))
        right = right.withColumn(
            "bkt", F.explode(F.sequence(F.lit(0).cast("long"),
                                        F.lit(salt - 1).cast("long"))))
        joined = left.join(right, on=["cell", "bkt"])
    else:
        joined = left.join(right, on="cell")
    dx = F.col("px") - F.col("px_b")
    dy = F.col("py") - F.col("py_b")
    dist2 = dx * dx + dy * dy
    # no distinct needed: the left side carries each point once (its home
    # cell) and the replicated right side is deduped per (pid, cell), so
    # every qualifying pair matches in exactly one cell — the home cell of
    # the left point. Saves a full shuffle over the pair set.
    return (joined
            .where(F.col("pid") < F.col("pid_b"))
            .where(dist2 <= F.lit(radius_deg) * F.lit(radius_deg))
            .select(F.col("pid").alias("a"), F.col("pid_b").alias("b")))


def thin_points_exact(points_df: DataFrame, radius_deg: float,
                      id_col: str = "pt_id",
                      lon_col: str = "lon", lat_col: str = "lat",
                      max_rounds: int = 64,
                      stats: dict | None = None) -> DataFrame:
    """EXACT distributed greedy thinning: identical output to the
    sequential fold the reference runs (iterate-dedup,
    /root/reference/src/utils/sampling.py:37-48, keep-lowest-id order).

    The sequential greedy is a priority MIS: p is KEPT iff every lower-id
    point within radius is DROPPED; DROPPED iff some lower-id neighbor is
    KEPT. Computed as a parallel fixpoint with TWO sound decision rules
    per round:

    * drop early — ANY kept lower-id neighbor drops a point immediately
      (the greedy drops it no matter how its other lower neighbors
      resolve), without waiting for them to be decided;
    * keep — all lower-id neighbors decided and none kept.

    Rounds needed = longest alternating kept/undecided dependency chain
    (O(log n) in expectation under hash/random id assignment —
    tools/thin_probe.py measures this at 1M points; ids assigned
    MONOTONICALLY along a dense curve are the adversarial case, where
    the sequential greedy itself has linear decision depth and no exact
    parallelization can beat the chain). Each round is one join against
    the still-undecided frontier (distance_join computes the neighbor
    graph once, up front). ``stats`` (optional dict) receives
    ``{"rounds": r}``."""
    pts = points_df.select(id_col, lon_col, lat_col)
    pairs = distance_join(pts, radius_deg, id_col, lon_col, lat_col).cache()
    # lower-id neighbor lists: edges a<b mean "b depends on a". The live
    # edge set SHRINKS each round: an edge whose pid is decided can never
    # influence anything again, and an edge whose lower is DROPPED
    # neither blocks (not undecided) nor kills (not kept) — pruning both
    # keeps later rounds scanning the frontier's edges, not the full
    # neighbor graph (measured ~2× at 1M points, 52M pairs).
    ids = pts.select(F.col(id_col).alias("pid"))
    undecided = ids
    live = pairs.withColumnRenamed("a", "lower").withColumnRenamed("b", "pid")
    # pruning pays a per-round materialization; on small graphs that
    # latency exceeds the scan it saves — one count on the (cached)
    # pair set decides (2.4× at 1M points / 52M edges; a wash below ~1M)
    prune_edges = pairs.count() >= 1_000_000
    kept = None
    converged = False
    rounds = 0
    for _ in range(max_rounds):
        if undecided.isEmpty():
            converged = True
            break
        rounds += 1
        und_lower = live.join(undecided.withColumnRenamed("pid", "lower"),
                              "lower", "left_semi")
        kept_lower = (live.join(kept.withColumnRenamed("pid", "lower"), "lower",
                                "left_semi") if kept is not None
                      else live.where(F.lit(False)))
        # early drop: a kept lower-id neighbor is final evidence (the
        # dropped set itself needs no accumulator — dropped points simply
        # leave `undecided` and never block anything)
        new_dropped = undecided.join(kept_lower.select("pid").distinct(), "pid",
                                     "left_semi")
        # keep: every lower-id nbr decided (none undecided), none kept
        new_kept = (undecided.join(new_dropped, "pid", "left_anti")
                    .join(und_lower.select("pid").distinct(), "pid", "left_anti"))
        kept = new_kept if kept is None else kept.union(new_kept)
        undecided = (undecided.join(new_dropped, "pid", "left_anti")
                     .join(new_kept, "pid", "left_anti"))
        kept = kept.localCheckpoint(eager=True)
        undecided = undecided.localCheckpoint(eager=True)
        if prune_edges:
            live = (live.join(undecided, "pid", "left_semi")
                    .join(new_dropped.withColumnRenamed("pid", "lower"),
                          "lower", "left_anti")
                    .localCheckpoint(eager=True))
    converged = converged or undecided.isEmpty()
    if stats is not None:
        stats["rounds"] = rounds
    pairs.unpersist()
    if not converged:
        n_left = undecided.count()
        raise RuntimeError(
            f"thin_points_exact did not converge within {max_rounds} rounds: "
            f"{n_left} points still undecided (dependency chain deeper than "
            "max_rounds). Raise max_rounds — returning a partial kept set "
            "would silently break the sequential-greedy equivalence.")
    return kept.select(F.col("pid"))


def thin_points(points_df: DataFrame, radius_deg: float,
                id_col: str = "pt_id",
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Min-distance thinning: drop points within `radius_deg` of a kept
    lower-id point (reference: iterate-dedup src/utils/sampling.py:37-48,
    re-grounded from a sequential fold to a deterministic per-cell greedy —
    documented semantic re-grounding, SURVEY.md §4 last row).

    Per coarse cell (with 3×3 halo), greedy-scan points by ascending id;
    decisions are emitted only for home-cell points, so the result is
    independent of partitioning. Chains longer than one halo radius may
    deviate from a global greedy — deterministic either way.
    """
    cell_level = max(0, min(24, int(np.floor(np.log2(180.0 / max(radius_deg, 1e-9))))))
    lvl = cell_level

    # NOTE: this encode stays a pandas UDF deliberately (r6): the JVM
    # morton algebra (attach_cell) was measured SLOWER here (0.69 s ->
    # 1.1 s at sf0.1) — the inner join's inferred isnotnull(cell) filter
    # gets pushed through the projections and re-inlines the whole
    # spread chain over the derived lon/lat into a ~16 KB per-row filter
    # expression; the Python-eval node is a pushdown barrier that keeps
    # the plan small. with_cell (kNN path) has the footprint UDF as its
    # barrier, so the JVM encode wins there.
    @F.pandas_udf(LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.encode(lon.to_numpy(), lat.to_numpy(), lvl))

    pts = points_df.select(
        F.col(id_col).alias("pid"), F.col(lon_col).alias("px"), F.col(lat_col).alias("py")
    ).withColumn("home", enc(F.col("px"), F.col("py")))

    rep_schema = StructType([
        StructField("pid", pts.schema["pid"].dataType),
        StructField("px", DoubleType()), StructField("py", DoubleType()),
        StructField("home", LongType()), StructField("cell", LongType()),
    ])

    def replicate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            nb = grid.neighbors(b["home"].to_numpy())
            n, k = nb.shape
            rep = b.loc[b.index.repeat(k)].reset_index(drop=True)
            rep["cell"] = nb.ravel()
            rep = rep.drop_duplicates(subset=["pid", "cell"])
            yield rep[["pid", "px", "py", "home", "cell"]]

    rep = pts.mapInPandas(replicate, rep_schema)
    out_schema = StructType([StructField("pid", pts.schema["pid"].dataType)])
    r = radius_deg

    def greedy(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = key[0]
        pdf = pdf.sort_values("pid").reset_index(drop=True)
        x = pdf["px"].to_numpy(); y = pdf["py"].to_numpy()
        n = len(pdf)
        kept = np.zeros(n, dtype=bool)
        for i in range(n):
            if i == 0:
                kept[i] = True
                continue
            prev = np.flatnonzero(kept[:i])
            d2 = (x[prev] - x[i]) ** 2 + (y[prev] - y[i]) ** 2
            kept[i] = not np.any(d2 <= r * r)
        keep_home = kept & (pdf["home"].to_numpy() == cell)
        return pdf.loc[keep_home, ["pid"]]

    from ..plans.salting import pin_kernel_partitions
    return (pin_kernel_partitions(rep, "cell")
            .groupBy("cell").applyInPandas(greedy, out_schema))
