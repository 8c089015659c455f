"""Streaming tests: availableNow file stream through the fused spatial
join and watermarked windows; results equal the batch plan."""

import pytest
from pyspark.sql import functions as F

from kaza_lcms_spark.operators import spatial_join as SJ
from kaza_lcms_spark.streaming import stream_tile_counts, windowed_event_stats


def _run_stream(df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_tile_counts_equals_batch(spark, fixture_dir):
    imgs_schema = spark.read.parquet(fixture_dir + "/images.parquet").schema
    stream = (spark.readStream.schema(imgs_schema)
              .parquet(fixture_dir)  # dir contains images.parquet
              .where(F.col("image_id").isNotNull()))
    idx = SJ.load_polygon_index_from_fixture()
    out = stream_tile_counts(spark, stream.select("image_id"), idx)
    _run_stream(out, "tile_counts", "complete")
    got = {r["unit_id"]: r["n"] for r in spark.sql("select * from tile_counts").collect()}

    batch = spark.read.parquet(fixture_dir + "/images.parquet").select("image_id")
    want = {r["unit_id"]: r["n"] for r in
            SJ.zonal_counts_fused(spark, batch, idx).collect()}
    assert got == want


def test_windowed_event_stats(spark):
    ev_dir = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{ev_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(ev_dir)
    out = windowed_event_stats(stream, window="1 hour")
    _run_stream(out, "ev_stats", "append")
    rows = spark.sql("select * from ev_stats").collect()
    batch = (spark.read.parquet(f"{ev_dir}/events.parquet")
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    got = {(r["window_start"], r["event_type"]): r["n"] for r in rows}
    # append mode emits only watermark-closed windows; all emitted rows
    # must match the batch truth and cover most windows
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v
