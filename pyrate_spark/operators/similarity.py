"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, compute
  dot products with zip_with/aggregate (JVM-side, no Python), rank per
  query. The exactness baseline.
- IVF: coarse quantisation by per-label centroid (the table's `label`
  is the cell id at test scale; at production scale cells come from a
  k-means job) — probe only the closest p cells, then exact rerank.
  Scan cost drops by ~n_cells/p.
- LSH (random hyperplanes): deterministic signed projections -> bucket
  signature; same-bucket candidates -> exact rerank. Projections are
  computed in ONE Arrow-vectorised pandas UDF (a single numpy matmul
  per batch), never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, query_ids, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours for each query id (queries drawn
    from the same table). Self-matches excluded. Deterministic
    tie-break on neighbour id."""
    q = (embeddings.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec")))
    cand = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("nvec"))
    scored = (cand.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_dot(F.col("qvec"), F.col("nvec"))
                              / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_topk(embeddings: DataFrame, query_ids, k: int = 5, probes: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cell_col: str = "label") -> DataFrame:
    """IVF: centroids per cell (one agg), probe the closest `probes`
    cells per query, exact rerank inside them."""
    dim_probe = (embeddings
                 .select(cell_col,
                         F.posexplode(vec_col).alias("pos", "component"))
                 .groupBy(cell_col, "pos")
                 .agg(F.avg("component").alias("c")))
    centroids = (dim_probe.groupBy(cell_col)
                 .agg(F.array_sort(
                     F.collect_list(F.struct("pos", "c"))).alias("sc"))
                 .select(cell_col, F.transform("sc", lambda s: s["c"])
                         .alias("centroid")))
    q = (embeddings.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec")))
    qc = (q.crossJoin(F.broadcast(centroids))
          .select("query_id", "qvec", cell_col,
                  (_dot(F.col("qvec"), F.col("centroid"))
                   / (_norm(F.col("qvec")) * _norm(F.col("centroid"))))
                  .alias("ccos")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"),
                                                F.asc(cell_col))
    probe_cells = (qc.withColumn("r", F.row_number().over(wq))
                   .where(F.col("r") <= probes)
                   .select("query_id", "qvec", cell_col))
    cand = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("nvec"), cell_col)
    scored = (cand.join(F.broadcast(probe_cells), cell_col)
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_dot(F.col("qvec"), F.col("nvec"))
                              / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def lsh_signatures(embeddings: DataFrame, n_planes: int = 16,
                   dim: int | None = None, seed: int = 42,
                   vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature as an int column. One numpy matmul
    per Arrow batch."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes)

    @pandas_udf("long")
    def signature(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())              # (batch, dim)
        bits = (M @ planes) > 0                    # (batch, n_planes)
        out = np.zeros(len(vecs), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return embeddings.withColumn("lsh_sig", signature(F.col(vec_col)))


def lsh_topk(embeddings: DataFrame, query_ids, k: int = 5,
             n_planes: int = 12, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN via same-signature candidates + exact rerank. Recall depends
    on n_planes; the exactness baseline is cosine_topk."""
    sig = lsh_signatures(embeddings, n_planes, seed=seed, vec_col=vec_col)
    q = (sig.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec"),
                 F.col("lsh_sig").alias("qsig")))
    cand = sig.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("nvec"), "lsh_sig")
    scored = (cand.join(F.broadcast(q),
                        cand["lsh_sig"] == q["qsig"])
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_dot(F.col("qvec"), F.col("nvec"))
                              / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
