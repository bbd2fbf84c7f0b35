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


def kmeans_centroids(embeddings: DataFrame, n_cells: int = 8,
                     iters: int = 10, seed: int = 42,
                     max_sample: int = 4096,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> np.ndarray:
    """Learn IVF cells with Lloyd's k-means on a deterministic sample.

    The sample is the first ``max_sample`` vectors by id (a seeded
    TABLESAMPLE at production scale — any deterministic subset works;
    cells only need to partition the space, not be optimal). Training
    is driver-side numpy: centroids are a tiny model, the expensive
    part (assignment of 10^12 rows) stays distributed.
    Init: k-means++ with a seeded RNG. Ties and empty cells resolve
    deterministically (first index / keep previous centroid)."""
    pdf = (embeddings.select(id_col, vec_col).orderBy(id_col)
           .limit(max_sample).toPandas())
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    cents = [X[rng.randint(len(X))]]
    for _ in range(1, n_cells):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in cents], axis=0)
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(X[rng.choice(len(X), p=p)])
    C = np.stack(cents)
    for _ in range(iters):
        # cosine assignment == euclidean on the normalised sphere
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_cells):
            m = assign == j
            if m.any():
                cj = X[m].mean(axis=0)
                C[j] = cj / max(np.linalg.norm(cj), 1e-12)
    return C


def assign_cells(embeddings: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding",
                 out_col: str = "cell") -> DataFrame:
    """Nearest-centroid cell id per row — ONE numpy matmul per Arrow
    batch against the broadcast centroid matrix."""
    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ C.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn(out_col, cell_of(F.col(vec_col)))


def ivf_topk_kmeans(embeddings: DataFrame, query_ids, k: int = 5,
                    probes: int = 2, n_cells: int = 8, seed: int = 42,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF with LEARNED cells: k-means centroids (driver-trained on a
    sample, broadcast), distributed assignment, probe the closest
    ``probes`` cells per query, exact rerank inside them. Scan cost
    drops by ~n_cells/probes versus brute force."""
    C = kmeans_centroids(embeddings, n_cells, seed=seed, vec_col=vec_col,
                         id_col=id_col)
    cells = assign_cells(embeddings, C, vec_col=vec_col)
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(int(j), [float(x) for x in C[j]]) for j in range(len(C))],
        f"cell int, centroid array<double>")
    q = (cells.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec")))
    qc = (q.crossJoin(F.broadcast(cent_df))
          .select("query_id", "qvec", "cell",
                  (_dot(F.col("qvec"), F.col("centroid"))
                   / (_norm(F.col("qvec")) * _norm(F.col("centroid"))))
                  .alias("ccos")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"),
                                                F.asc("cell"))
    probe_cells = (qc.withColumn("r", F.row_number().over(wq))
                   .where(F.col("r") <= probes)
                   .select("query_id", "qvec", "cell"))
    cand = cells.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("nvec"), "cell")
    scored = (cand.join(F.broadcast(probe_cells), "cell")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_dot(F.col("qvec"), F.col("nvec"))
                              / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_near_pairs(embeddings: DataFrame, threshold: float = 0.25,
                      method: str = "brute", id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      n_tables: int = 24,
                      planes_per_table: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and rounded cosine >= threshold.

    method='brute' is the exact all-pairs baseline (the oracle path —
    quadratic, fine for verification scale); method='lsh' routes
    candidate generation through the multi-table hyperplane signatures
    (same trade as lsh_topk_multi) and exact-verifies survivors — the
    10^12-row path, where all-pairs is impossible."""
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("va"))
    if method == "brute":
        b = embeddings.select(F.col(id_col).alias("id_b"),
                              F.col(vec_col).alias("vb"))
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        sig = lsh_multi_signatures(embeddings, n_tables, planes_per_table,
                                   vec_col=vec_col)
        sa = sig.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"), "lsh_table",
                        F.col("lsh_sig").alias("sig_a"))
        sb = sig.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"),
                        F.col("lsh_table").alias("tbl_b"),
                        F.col("lsh_sig").alias("sig_b"))
        cand = (sa.join(sb, (F.col("lsh_table") == F.col("tbl_b"))
                        & (F.col("sig_a") == F.col("sig_b"))
                        & (F.col("id_a") < F.col("id_b")))
                .dropDuplicates(["id_a", "id_b"]))
    else:
        raise ValueError(f"unknown method {method}")
    cos = F.round(_dot(F.col("va"), F.col("vb"))
                  / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
    return (cand.select("id_a", "id_b", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold))


def recall_vs_bruteforce(approx: DataFrame, exact: DataFrame,
                         k: int = 5) -> DataFrame:
    """(query_id, recall) — fraction of the exact top-k the approximate
    result recovered. Both inputs: (query_id, neighbor_id, ...)."""
    hits = (exact.select("query_id", "neighbor_id")
            .join(approx.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hit")))
    base = exact.select("query_id").distinct()
    return (base.join(hits, "query_id", "left")
            .select("query_id",
                    (F.coalesce("n_hit", F.lit(0)) / F.lit(float(k)))
                    .alias("recall")))


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


def lsh_multi_signatures(embeddings: DataFrame, n_tables: int = 16,
                         planes_per_table: int = 4,
                         dim: int | None = None, seed: int = 42,
                         vec_col: str = "embedding") -> DataFrame:
    """Multi-table hyperplane LSH: L independent signature tables of b
    planes each (candidate = match in ANY table — the classic
    recall/scan trade, Indyk-Motwani style). ALL L signatures come out
    of ONE numpy matmul per Arrow batch. Returns one row per (row,
    table): (..., lsh_table, lsh_sig)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_tables * planes_per_table)

    @pandas_udf("array<long>")
    def signatures(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())                    # (batch, dim)
        bits = (M @ planes) > 0                          # (batch, L*b)
        bits = bits.reshape(len(vecs), n_tables, planes_per_table)
        weights = (1 << np.arange(planes_per_table)).astype(np.int64)
        sigs = (bits * weights).sum(axis=2)              # (batch, L)
        return pd.Series(list(sigs))

    sig = embeddings.withColumn("_sigs", signatures(F.col(vec_col)))
    return (sig.select("*", F.posexplode("_sigs")
                       .alias("lsh_table", "lsh_sig"))
            .drop("_sigs"))


def lsh_topk_multi(embeddings: DataFrame, query_ids, k: int = 5,
                   n_tables: int = 16, planes_per_table: int = 4,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """ANN via multi-table LSH candidates + exact rerank. Candidate =
    same signature in >= 1 of the L tables; the per-table equi-join is
    the only shuffle and the rerank touches candidates only."""
    sig = lsh_multi_signatures(embeddings, n_tables, planes_per_table,
                               seed=seed, vec_col=vec_col)
    # rename BOTH join keys on the query side: the two frames share
    # lineage, and same-named Column refs would resolve trivially-true
    q = (sig.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec"),
                 F.col("lsh_table").alias("qtable"),
                 F.col("lsh_sig").alias("qsig")))
    cand_rows = sig.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("nvec"),
                           "lsh_table", "lsh_sig")
    cand = (cand_rows.join(F.broadcast(q),
                           (F.col("lsh_table") == F.col("qtable"))
                           & (F.col("lsh_sig") == F.col("qsig")))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "qvec", "neighbor_id", "nvec")
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(_dot(F.col("qvec"), F.col("nvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
                6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


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
