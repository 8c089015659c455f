"""Streaming tests: availableNow file stream through the fused spatial
join and watermarked windows; results equal the batch plan. Stateful
session windows (applyInPandasWithState) stitch sessions across
micro-batch boundaries and match the gated batch sessionize query."""

import pytest
from pyspark.sql import functions as F

from kaza_lcms_spark.operators import spatial_join as SJ
from kaza_lcms_spark.streaming import (sessionize_stateful, stream_tile_counts,
                                       windowed_event_stats)


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


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """Split events chronologically into two files streamed as separate
    micro-batches (maxFilesPerTrigger=1): sessions spanning the file
    boundary must be stitched by the per-user state, and every CLOSED
    session must equal the batch sessionize result exactly. Each user's
    final session legitimately stays open (append semantics)."""
    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "event_id", "ts", "value"))
    cutoff = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    src = str(tmp_path / "ev_stream")
    (ev.where(F.unix_timestamp("ts") <= cutoff).coalesce(1)
       .write.parquet(src + "/f=0"))
    (ev.where(F.unix_timestamp("ts") > cutoff).coalesce(1)
       .write.parquet(src + "/f=1"))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/f=*")
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize_stateful(stream)
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch

    got = {(r["user_id"], r["session_seq"]): (r["n_events"], r["sum_value"])
           for r in spark.sql("select * from sess").collect()}
    want = {(r["user_id"], r["session_seq"]): (r["n_events"], float(r["sum_value"]))
            for r in E.q_sessionize(spark, sf_dir).collect()}
    assert len(got) > 0
    # every closed session matches the batch row exactly
    for k, (n, sv) in got.items():
        assert want[k][0] == n, k
        assert want[k][1] == pytest.approx(sv, abs=0.02), k
    # coverage: exactly the non-final sessions close
    last = {}
    for (u, s) in want:
        last[u] = max(last.get(u, 0), s)
    expected_closed = {(u, s) for (u, s) in want if s < last[u]}
    assert set(got) == expected_closed


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


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Duplicate texts are split across two micro-batches (odd/even
    doc_id files): the state store must drop the second arrival across
    the batch boundary, leaving exactly the batch-distinct text set."""
    from kaza_lcms_spark.streaming.windows import stream_exact_dedup

    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # inject duplicates whose +1001 id FLIPS parity, so each duplicate
    # text lands in the other micro-batch file than its original
    dups = (base.where(F.col("doc_id") % 10 == 0)
            .withColumn("doc_id", F.col("doc_id") + 1001))
    docs = (base.unionByName(dups)
            .withColumn("ts", F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")))
    src = str(tmp_path / "doc_stream")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src + "/f=0")
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(src + "/f=1")

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f=*"))
    q = (stream_exact_dedup(stream).writeStream.format("memory")
         .queryName("dedup_stream").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1

    got = spark.sql("select text from dedup_stream").collect()
    texts = [r["text"] for r in got]
    n_distinct_batch = docs.select("text").distinct().count()
    assert len(texts) == len(set(texts)) == n_distinct_batch
    # and duplicates genuinely existed across the two files
    assert docs.count() > n_distinct_batch


def test_stream_ingest_catalog_equals_batch_ingest(spark, tmp_path):
    """Streaming a feed through the foreachBatch manifest sink must build
    the SAME catalog table as one batch write_partitioned call: same
    partition set, same per-partition lineage row counts, same row
    multiset through read_table — and a restarted stream (same
    checkpoint, no new input) must not duplicate anything."""
    from kaza_lcms_spark.sources.catalog import Catalog
    from kaza_lcms_spark.streaming import stream_ingest_catalog

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang")
            .withColumn("pt", (F.col("doc_id") % 4).cast("long")))
    src = str(tmp_path / "ingest_src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src + "/f=0")
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(src + "/f=1")

    bcat = Catalog(str(tmp_path / "cat_batch"))
    bcat.write_partitioned(spark, docs, "docs", "pt")

    scat = Catalog(str(tmp_path / "cat_stream"))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f=*"))
    q = stream_ingest_catalog(stream, scat, "docs", "pt",
                              checkpoint=str(tmp_path / "ckpt_ing"))
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1          # really multi-batch

    assert scat.committed_partitions("docs") == bcat.committed_partitions("docs")
    b_rows = {l.partition: l.n_rows for l in bcat.lineage("docs")}
    s_rows = {l.partition: l.n_rows for l in scat.lineage("docs")}
    assert s_rows == b_rows
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(scat.read_table(spark, "docs")) == key(bcat.read_table(spark, "docs"))
    # one snapshot per micro-batch on the streaming side
    assert len(scat.snapshots("docs")) >= 2

    # restart with the same checkpoint and no new files: no-op
    before = key(scat.read_table(spark, "docs"))
    q2 = stream_ingest_catalog(
        (spark.readStream.schema(docs.schema)
         .option("maxFilesPerTrigger", 1).parquet(src + "/f=*")),
        scat, "docs", "pt", checkpoint=str(tmp_path / "ckpt_ing"))
    q2.awaitTermination(180)
    assert key(scat.read_table(spark, "docs")) == before


def test_append_batch_replay_is_skipped(spark, tmp_path):
    """Direct exactly-once check: re-delivering an already-committed
    batch id (what foreachBatch does after a mid-commit failure) must be
    a no-op, while the next id appends."""
    from kaza_lcms_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat_replay"))
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).alias("pt"))
    r1 = cat.append_batch(spark, df, "t", "pt", batch_id=0)
    assert r1["n_rows"] == 10 and not r1["replayed_batch"]
    r2 = cat.append_batch(spark, df, "t", "pt", batch_id=0)   # replay
    assert r2["replayed_batch"] and r2["n_rows"] == 0
    assert cat.read_table(spark, "t").count() == 10
    r3 = cat.append_batch(spark, df, "t", "pt", batch_id=1)   # next batch
    assert r3["n_rows"] == 10
    assert cat.read_table(spark, "t").count() == 20
    rows = {l.partition: l.n_rows for l in cat.lineage("t")}
    assert rows == {"0": 10, "1": 10}


def test_stream_ingest_with_clustered_layout(spark, tmp_path):
    """Streaming ingest through layout=cell_clustered must keep the same
    pruning story as batch ingest: identical row multiset AND every
    committed parquet file internally sorted by cell_id (the property
    footer min/max pruning relies on)."""
    import pyarrow.parquet as pq

    from kaza_lcms_spark.sources.catalog import Catalog
    from kaza_lcms_spark.sources.layout import cell_clustered
    from kaza_lcms_spark.streaming import stream_ingest_catalog

    rows = spark.range(2000).select(
        F.col("id").alias("image_id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("cell_id"),
        (F.col("id") % 3).alias("pt"))
    src = str(tmp_path / "clustered_src")
    rows.where(F.col("image_id") % 2 == 0).coalesce(1).write.parquet(src + "/f=0")
    rows.where(F.col("image_id") % 2 == 1).coalesce(1).write.parquet(src + "/f=1")

    cat = Catalog(str(tmp_path / "cat_layout"))
    layout = lambda d: cell_clustered(d, n_files=2)  # noqa: E731
    stream = (spark.readStream.schema(rows.schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f=*"))
    q = stream_ingest_catalog(stream, cat, "imgs", "pt",
                              checkpoint=str(tmp_path / "ckpt_layout"),
                              layout=layout)
    q.awaitTermination(180)

    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(cat.read_table(spark, "imgs")) == key(rows)
    files = [f for l in cat.lineage("imgs") for f in l.files]
    assert len(files) >= 4                      # ≥2 files × ≥2 batches
    for f in files:
        cells = pq.read_table(f, columns=["cell_id"])["cell_id"].to_pylist()
        assert cells == sorted(cells), f
