"""kNN / similarity-search operators (BASELINE.json::north_star "kNN
caption-neighbor lookups per cell" + driver requirement: ANN over an
embedding column).

Three strategies, by scale:

* ``cosine_topk_relational`` — exact brute force as pure relational ops
  with a deterministic left-to-right dot-product fold (functions.dot_fold)
  → bit-replayable by the SQL oracle. O(n²) pairs: correctness baseline.
* ``cosine_topk_blocked`` — exact brute force, numpy matmul inside
  applyInPandas over query blocks against a broadcast item matrix: the
  fast single-machine path (Arrow batches, BLAS). Same results, ~100×.
* ``knn_per_cell`` — the scale path: equi-join restricted to each point's
  own (salted) spatial cell + halo, so comparisons stay local; the 10¹²
  analog of GEE's withinDistance join (src/utils/sampling.py:12-28).

Hamming kNN over phash (images) / simhash (docs) uses the same shapes
with bit_count(xor) distance — JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

from .. import functions as KF


def cosine_topk_relational(emb: DataFrame, k: int = 5,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """(vec_id, neighbor_id, cos) top-k by cosine, excluding self; ties
    broken by neighbor id. Vectors are L2-normalized upstream (dot =
    cosine); fold order is deterministic for oracle parity."""
    a = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    b = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    dot = KF.dot_fold(F.col("qv"), F.col("nv"))
    pairs = (a.crossJoin(b).where(F.col("qid") != F.col("nid"))
             .select("qid", "nid", dot.alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(F.col("qid").alias("vec_id"), F.col("nid").alias("neighbor_id"),
                    F.round(F.col("cos"), 4).alias("cos")))


def cosine_topk_blocked(spark: SparkSession, emb: DataFrame, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k via numpy: broadcast the (n, d) item matrix, stream
    query blocks through mapInPandas, argpartition per block. At 100 TB
    the broadcast side becomes an IVF shard join; the per-block kernel is
    unchanged."""
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = StructType([
        StructField("vec_id", LongType()), StructField("neighbor_id", LongType()),
        StructField("cos", DoubleType()),
    ])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        M, I = b_mat.value, b_ids.value
        for bdf in batches:
            if not len(bdf):
                continue
            q = np.array(list(bdf[vec_col]), dtype=np.float64)
            qid = bdf[id_col].to_numpy()
            sims = q @ M.T                       # (bq, n) BLAS
            order_ids = I[None, :] == qid[:, None]
            sims[order_ids] = -np.inf            # exclude self
            kk = min(k, sims.shape[1] - 1)
            # top-k with (−cos, id) lexicographic tie-break
            part = np.argpartition(-sims, kk, axis=1)[:, : kk + 4]
            rows_out = []
            for r in range(len(qid)):
                cand = part[r]
                cand = cand[np.lexsort((I[cand], -sims[r, cand]))][:kk]
                rows_out.append(pd.DataFrame({
                    "vec_id": qid[r], "neighbor_id": I[cand],
                    "cos": np.round(sims[r, cand], 4)}))
            yield pd.concat(rows_out)

    return emb.select(id_col, vec_col).mapInPandas(probe, out_schema)


def hamming_topk(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                 hash_col: str = "h") -> DataFrame:
    """(id, neighbor_id, hamming) top-k nearest by bit_count(xor), ties by
    (distance, neighbor id). JVM-side distance; window top-k."""
    a = df.select(F.col(id_col).alias("qid"), F.col(hash_col).alias("ha"))
    b = df.select(F.col(id_col).alias("nid"), F.col(hash_col).alias("hb"))
    d = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    pairs = (a.crossJoin(b).where(F.col("qid") != F.col("nid"))
             .select("qid", "nid", d.alias("hamming")))
    w = Window.partitionBy("qid").orderBy(F.col("hamming").asc(), F.col("nid").asc())
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(F.col("qid").alias(id_col), F.col("nid").alias("neighbor_id"),
                    "hamming"))


def knn_per_cell(points: DataFrame, k: int, cell_col: str = "cell_id",
                 id_col: str = "image_id", hash_col: str = "phash",
                 salt_threshold: int = 20000) -> DataFrame:
    """Per-cell kNN by phash Hamming distance — the north-star "caption
    neighbors per cell" operator. Comparisons are restricted to the
    spatial cell (borders handled by querying at a coarser parent level
    upstream); within each cell a numpy SWAR-popcount matrix runs inside
    applyInPandas. Cells larger than `salt_threshold` rows are processed
    in sub-blocks to bound memory (hot river/border cells)."""
    from ..kernels import codec

    out_schema = StructType([
        StructField(id_col, points.schema[id_col].dataType),
        StructField("neighbor_id", points.schema[id_col].dataType),
        StructField("hamming", LongType()),
    ])

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame({id_col: [], "neighbor_id": [], "hamming": []})
        ids = pdf[id_col].to_numpy()
        h = pdf[hash_col].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")  # id-ordered for tie-break
        ids, h = ids[order], h[order]
        kk = min(k, n - 1)
        outs = []
        block = max(256, salt_threshold * 400 // max(n, 1))
        for s in range(0, n, block):
            e = min(n, s + block)
            d = codec.hamming64(h[s:e, None], h[None, :])  # (b, n)
            d[np.arange(e - s), np.arange(s, e)] = 1 << 30  # exclude self
            # stable argsort on distance + id-sorted columns ≡ (dist, id) order
            take = np.argsort(d, axis=1, kind="stable")[:, :kk]
            rows = np.arange(s, e)
            outs.append(pd.DataFrame({
                id_col: np.repeat(ids[rows], kk),
                "neighbor_id": ids[take].ravel(),
                "hamming": np.take_along_axis(d, take, axis=1).ravel(),
            }))
        return pd.concat(outs)

    return points.groupBy(cell_col).applyInPandas(per_cell, out_schema)
