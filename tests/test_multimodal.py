"""Multimodal plumbing tests: deterministic area resize (scalar == batch,
exact box means), multi-frame container round-trip, frame sampling through
mapInPandas, resize through mapInPandas, and the explicit real-codec stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kaza_lcms_spark.kernels import codec


def test_resize_area_exact_box_means():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    out = codec.resize_area(px, 8, 12)
    # every output cell is the rounded mean of its 4x4 box
    for i in range(8):
        for j in range(12):
            want = px[4 * i:4 * i + 4, 4 * j:4 * j + 4].astype(np.float64).mean()
            assert out[i, j] == np.clip(np.round(want), 0, 255), (i, j)


def test_resize_area_batch_matches_scalar():
    rng = np.random.default_rng(4)
    stack = rng.integers(0, 256, (17, 40, 24), dtype=np.uint8)
    got = codec.resize_area_batch(stack, 10, 10)
    for i in range(17):
        assert np.array_equal(got[i], codec.resize_area(stack[i], 10, 10)), i


def test_resize_area_upscale_nearest():
    px = np.array([[0, 255]], dtype=np.uint8)
    out = codec.resize_area(px, 2, 4)
    assert out.shape == (2, 4)
    assert np.array_equal(out, np.array([[0, 0, 255, 255]] * 2, dtype=np.uint8))


def test_frame_container_roundtrip():
    rng = np.random.default_rng(5)
    frames = [codec.encode(rng.integers(0, 256, (16, 16), dtype=np.uint8), "raw")
              for _ in range(7)]
    blob = codec.pack_frames(frames)
    assert codec.frame_count(blob) == 7
    got = list(codec.iter_frames(blob))
    assert [i for i, _ in got] == list(range(7))
    assert all(fr == frames[i] for i, fr in got)


def test_decode_video_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="h264"):
        list(codec.decode_video(b"xxxx", fmt="h264"))


def test_resize_images_spark(spark, fixture_dir):
    from kaza_lcms_spark.sources import images as IMG
    imgs = spark.read.parquet(fixture_dir + "/images.parquet").limit(300)
    out = IMG.resize_images(imgs, 8, 8).collect()
    src = {r["image_id"]: bytes(r["bytes"]) for r in
           imgs.select("image_id", "bytes").collect()}
    assert len(out) == 300
    for r in out[:50]:
        px, fmt = codec.decode(bytes(r["bytes"]))
        assert fmt == "raw" and px.shape == (8, 8)
        want = codec.resize_area(codec.decode(src[r["image_id"]])[0], 8, 8)
        assert np.array_equal(px, want), r["image_id"]


def test_sample_frame_stats_spark(spark, fixture_dir):
    from kaza_lcms_spark.sources import images as IMG
    imgs = spark.read.parquet(fixture_dir + "/images.parquet").limit(40)
    rows = imgs.select("image_id", "bytes").collect()
    # build 8 videos of 5 frames each from fixture images
    vids = []
    for v in range(8):
        frames = [bytes(rows[5 * v + i]["bytes"]) for i in range(5)]
        vids.append((f"vid_{v}", bytearray(codec.pack_frames(frames))))
    vdf = spark.createDataFrame(vids, "video_id string, video binary")
    out = IMG.sample_frame_stats(vdf, every_k=2).collect()
    # frames 0, 2, 4 sampled per video
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert set(by_vid) == {f"vid_{v}" for v in range(8)}
    assert all(sorted(v) == [0, 2, 4] for v in by_vid.values())
    # stats match a direct decode
    for r in out:
        v = int(r["video_id"].split("_")[1])
        px = codec.decode(bytes(rows[5 * v + r["frame_idx"]]["bytes"]))[0]
        assert r["mean_px"] == pytest.approx(float(px.mean()))
        assert r["phash"] == codec.phash64(px)
