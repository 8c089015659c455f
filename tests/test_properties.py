"""Property-based kernel tests (SURVEY.md §5.4) — hypothesis over the
pure-numpy layer (no Spark session needed; fast)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kaza_lcms_spark.kernels import codec, geom, grid, rand

LON = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
LAT = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
LEVEL = st.integers(min_value=1, max_value=27)


@given(st.lists(st.tuples(LON, LAT), min_size=1, max_size=50), LEVEL)
@settings(max_examples=100, deadline=None)
def test_cell_roundtrip_contains_point(pts, level):
    lon = np.array([p[0] for p in pts]); lat = np.array([p[1] for p in pts])
    c = grid.encode(lon, lat, level)
    x0, y0, x1, y1 = grid.cell_bounds(c)
    # quantization happens in (lon+180)/360 space: a point within half an
    # ulp of a cell edge may land in the adjacent cell — consistent
    # everywhere in the engine (same quantizer), so allow epsilon slip
    eps = 1e-9
    assert ((lon >= x0 - eps) & (lon < x1 + eps)).all()
    assert ((lat >= y0 - eps) & (lat < y1 + eps)).all()


@given(st.lists(st.tuples(LON, LAT), min_size=1, max_size=30),
       st.integers(min_value=2, max_value=27))
@settings(max_examples=100, deadline=None)
def test_parent_is_prefix(pts, level):
    lon = np.array([p[0] for p in pts]); lat = np.array([p[1] for p in pts])
    c = grid.encode(lon, lat, level)
    p = grid.parent(c, level - 1)
    # direct encode at the coarser level gives the same cell
    assert (p == grid.encode(lon, lat, level - 1)).all()


@given(st.integers(min_value=3, max_value=12),
       st.floats(min_value=-5, max_value=5),
       st.floats(min_value=-5, max_value=5),
       st.integers(min_value=0, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_pip_translation_invariance(nvert, dx, dy, seed):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.random(nvert)) * 2 * np.pi
    r = 0.5 + rng.random(nvert)
    xs, ys = r * np.cos(ang), r * np.sin(ang)
    px = rng.random(200) * 4 - 2
    py = rng.random(200) * 4 - 2
    a = geom.points_in_polygon(px, py, xs, ys)
    b = geom.points_in_polygon(px + dx, py + dy, xs + dx, ys + dy)
    # FP translation can flip points within ~1e-9 of an edge; tolerate none
    # for these grid-free random draws (measure-zero)
    assert (a == b).mean() > 0.995


@given(st.integers(min_value=1, max_value=200), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_strtree_equals_bruteforce(n, seed):
    rng = np.random.default_rng(seed)
    boxes = rng.random((n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.random((n, 2)) * 0.3
    tree = geom.STRtree(boxes)
    q = rng.random(4)
    q[2:] = q[:2] + rng.random(2) * 0.4
    got = set(tree.query_box(*q).tolist())
    want = {i for i in range(n)
            if boxes[i, 0] <= q[2] and boxes[i, 2] >= q[0]
            and boxes[i, 1] <= q[3] and boxes[i, 3] >= q[1]}
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=100, unique=True),
       st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_rng_deterministic_and_uniformish(keys, seed):
    k = np.array(keys, dtype=np.int64)
    u1 = rand.uniform(k, seed)
    u2 = rand.uniform(k, seed)
    assert (u1 == u2).all()
    assert ((u1 >= 0) & (u1 < 1)).all()
    # different seed decorrelates
    u3 = rand.uniform(k, seed + 1)
    assert len(k) < 3 or not np.array_equal(u1, u3)


@given(st.integers(min_value=1, max_value=64), st.integers(min_value=1, max_value=64),
       st.integers(min_value=0, max_value=10**6))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for fmt in ("raw", "rle"):
        d, f = codec.decode(codec.encode(px, fmt))
        assert f == fmt and (d == px).all()
    dq, _ = codec.decode(codec.encode(px, "quant"))
    assert codec.psnr(px, dq) >= 40.0


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), min_size=2,
                max_size=50, unique=True))
@settings(max_examples=100, deadline=None)
def test_hamming_metric_properties(hashes):
    h = np.array(hashes, dtype=np.int64)
    d = codec.hamming64(h[:, None], h[None, :])
    assert (d == d.T).all()
    assert (np.diag(d) == 0).all()
    assert (d <= 64).all()


@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=1, max_size=40),
       st.integers(min_value=-2**63, max_value=2**63 - 1))
@settings(max_examples=150, deadline=None)
def test_hamming64_matches_bit_count(hs, q):
    got = codec.hamming64(np.array(hs, dtype=np.int64), np.int64(q))
    want = [bin((h ^ q) & (2**64 - 1)).count("1") for h in hs]
    assert got.tolist() == want


@given(st.integers(min_value=1, max_value=48), st.integers(min_value=1, max_value=48),
       st.integers(min_value=1, max_value=16), st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=60, deadline=None)
def test_resize_constant_image_stays_constant(h, w, oh, ow, v):
    px = np.full((h, w), v, dtype=np.uint8)
    out = codec.resize_area(px, oh, ow)
    assert out.shape == (oh, ow)
    assert (out == v).all()


@given(st.integers(min_value=8, max_value=40), st.integers(min_value=8, max_value=40),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=40, deadline=None)
def test_resize_preserves_global_mean_on_divisible(h8, w8, f):
    rng = np.random.default_rng(h8 * 100 + w8)
    h, w = h8 * f, w8 * f
    px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = codec.resize_area(px, h8, w8)
    # divisible boxes: means exact before rounding -> global mean within 0.5
    assert abs(out.astype(float).mean() - px.astype(float).mean()) <= 0.5


@given(st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=12))
@settings(max_examples=80, deadline=None)
def test_frame_container_roundtrip_any_payload(frames):
    blob = codec.pack_frames(frames)
    assert codec.frame_count(blob) == len(frames)
    assert [f for _, f in codec.iter_frames(blob)] == frames


@given(st.integers(1, 40), st.integers(1, 60), st.integers(1, 8),
       st.integers(0, 2**31 - 1), st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_knn_block_xq_equals_bruteforce(nq, ni, k, seed, dup_every):
    """Cross-set counting-select kernel (mega-cell tier) vs a direct
    numpy argsort over the same (distance, id) order — including heavy
    hash ties (dup_every clones hashes) and query ids present/absent
    from the item side (self-exclusion by id)."""
    from kaza_lcms_spark.operators.knn import _knn_block_xq

    rng = np.random.default_rng(seed)
    i_ids = np.sort(rng.choice(10_000, size=ni, replace=False)).astype(np.int64)
    # queries: some overlap the item id space, the rest are foreign
    n_over = min(max(1, nq // 2), ni)
    q_ids = np.concatenate([
        rng.choice(i_ids, size=n_over, replace=False),
        rng.choice(np.arange(10_000, 10_000 + nq), size=nq - n_over,
                   replace=False)]).astype(np.int64)
    pool = rng.integers(0, 2**62, size=max(1, ni // dup_every), dtype=np.int64)
    i_h = pool[rng.integers(0, len(pool), size=ni)]
    q_h = pool[rng.integers(0, len(pool), size=nq)]

    out = _knn_block_xq(q_ids, q_h, i_ids, i_h, k, "qid")
    got = {}
    import pandas as pd
    res = pd.concat(out) if out else pd.DataFrame(
        {"qid": [], "neighbor_id": [], "hamming": []})
    for r in res.itertuples():
        got.setdefault(r.qid, []).append((r.hamming, r.neighbor_id))

    for qi, qh in zip(q_ids, q_h):
        d = codec.hamming64(i_h, np.full(ni, qh, dtype=np.int64)).astype(np.int64)
        mask = i_ids != qi
        cand = sorted(zip(d[mask], i_ids[mask]))[:k]
        want = [(int(dd), int(ii)) for dd, ii in cand]
        assert sorted(got.get(qi, [])) == want, (qi, k)
