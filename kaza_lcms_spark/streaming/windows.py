"""Streaming operators: watermarked windows + stream-static spatial join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geom
from ..operators import spatial_join as SJ


def windowed_event_stats(stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours",
                         ts_col: str = "ts") -> DataFrame:
    """Tumbling event-time window counts + mean with late-data watermark —
    the streaming analog of the reference's per-period composites
    (reduce over a filtered date range, src/utils/s2process.py:124-139)."""
    # TIMESTAMP_NTZ (tz-naive parquet) is not a legal event-time type
    return (stream
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "avg_value"))


def stream_tile_counts(spark: SparkSession, stream_images: DataFrame,
                       index: geom.PolygonIndex) -> DataFrame:
    """Stream-static spatial join: the SAME fused footprint→cell→PIP kernel
    used in batch (operators/spatial_join.assign_images_fused) applied to a
    streaming image feed, aggregated to per-unit counts. mapInPandas is a
    stateless narrow transform, so it is streaming-legal; the groupBy is a
    streaming aggregation (complete/update mode)."""
    assigned = SJ.assign_images_fused(spark, stream_images, index)
    return assigned.groupBy("unit_id").agg(F.count(F.lit(1)).alias("n"))
