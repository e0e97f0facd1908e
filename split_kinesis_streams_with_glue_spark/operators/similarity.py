"""Similarity search over embedding columns (SURVEY.md X2).

- ``brute_force_topk``: exact cosine top-k — broadcast the query set against
  the corpus, per-query window top-k. The correctness baseline; linear scan,
  embarrassingly parallel, no shuffle beyond the final tiny top-k.
- ``ivf_topk``: IVF-style approximate search — deterministic coarse
  centroids, corpus bucketed by nearest centroid, queries probe only
  ``nprobe`` buckets. The 100 TB path: the probe join touches
  nprobe/#centroids of the corpus instead of all of it, and the centroid
  assignment is itself a broadcast join (centroid count is small by design).
- ``cosine_pairs_topk``: top-k most-similar *pairs* in the corpus
  (all-pairs form used by embedding near-dup dedup).

Embeddings here are unit-normalized (fixture property), so cosine == dot;
``cosine=True`` recomputes full cosine when inputs aren't normalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.functions.vectors import cosine, dot


def _sim(a, b, normalized: bool):
    return dot(a, b) if normalized else cosine(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim, rank).

    The query set is broadcast (it is small by contract); the corpus scan is
    a single pass; per-query ranking is a window over query_id partitions.
    Self-matches are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _sim(F.col("qvec"), F.col("cvec"), normalized).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def choose_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n`` corpus vectors with the
    smallest ids (a seeded-sample stand-in for k-means — at scale you'd run
    ``pyspark.ml`` KMeans once and persist the codebook)."""
    return (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Nearest-centroid assignment via broadcast join + per-vector argmax
    window. Output: corpus columns + ``bucket``."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        _sim(F.col(vec_col), F.col("centroid_vec"), normalized).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("centroid_id").alias("bucket"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` buckets nearest each
    query. Recall is tunable via nprobe; exactness is traded for touching
    nprobe/n_centroids of the corpus."""
    cents = choose_centroids(corpus, n_centroids, id_col, vec_col)
    bucketed = assign_buckets(corpus, cents, id_col, vec_col, normalized)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qs = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qvec", "centroid_id",
        _sim(F.col("qvec"), F.col("centroid_vec"), normalized).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    probes = (
        qs.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "qvec", F.col("centroid_id").alias("bucket"))
    )

    scored = (
        bucketed.join(F.broadcast(probes), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _sim(F.col("qvec"), F.col(vec_col), normalized).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_pairs_topk(
    corpus: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Top-k most-similar distinct pairs (d1 < d2) in the corpus — the
    embedding-cosine near-dup detector in top-k form.

    Executed as a blocked matrix multiply: the corpus matrix is broadcast
    (same size contract as a broadcast join side), each ``mapInPandas``
    Arrow batch computes its rows' similarities against the full matrix with
    one numpy matmul and emits only its local top-k; a final window picks
    the global top-k from #batches × k candidates — exact, since a global
    top-k pair is top-k within its own batch. This is the one place Python
    beats codegen: BLAS matmul vs 2M interpreted higher-order-function
    folds (~10× at bench scale).

    At 100 TB the corpus no longer broadcasts — run this per IVF/LSH bucket
    (compose with ``assign_buckets``) so each bucket's matrix fits.
    """
    import numpy as np

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if not normalized:
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat))

    def local_topk(batches):
        import pandas as pd

        ids_all, m_all = bc.value
        for pdf in batches:
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if not normalized:
                b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = b_mat @ m_all.T  # (batch, corpus)
            mask = ids_all[None, :] > b_ids[:, None]  # d1 < d2 only
            sims_masked = np.where(mask, sims, -np.inf)
            flat = sims_masked.ravel()
            n_keep = min(k, int(np.isfinite(flat).sum()))
            if n_keep == 0:
                yield pd.DataFrame({"d1": [], "d2": [], "sim": []}).astype(
                    {"d1": "int64", "d2": "int64", "sim": "float64"}
                )
                continue
            top = np.argpartition(-flat, n_keep - 1)[:n_keep]
            r, c = np.unravel_index(top, sims_masked.shape)
            yield pd.DataFrame(
                {"d1": b_ids[r], "d2": ids_all[c], "sim": sims[r, c]}
            )

    candidates = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, "d1 bigint, d2 bigint, sim double"
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("d1"), F.col("d2"))
    return candidates.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """All distinct pairs (d1 < d2) with cosine >= threshold — the
    embedding-cosine near-dup detector in threshold form.

    Same blocked-matmul shape as ``cosine_pairs_topk`` but each Arrow batch
    emits *every* pair above the threshold instead of a local top-k, so no
    final window is needed: the output is embarrassingly parallel and its
    size is bounded by the true near-dup count, not a k knob.

    At 100 TB the broadcast side no longer fits — compose with
    ``assign_buckets`` / ``rp_lsh_signatures`` to run the exact
    threshold check per bucket (near-dups above a high threshold collide in
    some bucket with probability -> 1 as tables are OR-ed)."""
    import numpy as np

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if not normalized:
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat))

    def above_threshold(batches):
        import pandas as pd

        ids_all, m_all = bc.value
        for pdf in batches:
            b_ids = pdf[id_col].to_numpy(dtype=np.int64)
            b_mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if not normalized:
                b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = b_mat @ m_all.T
            r, c = np.nonzero((sims >= threshold) & (ids_all[None, :] > b_ids[:, None]))
            yield pd.DataFrame(
                {"d1": b_ids[r], "d2": ids_all[c], "sim": sims[r, c]}
            ).astype({"d1": "int64", "d2": "int64", "sim": "float64"})

    return corpus.select(id_col, vec_col).mapInPandas(
        above_threshold, "d1 bigint, d2 bigint, sim double"
    )


def embedding_dedup(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Drop every vector that has a near-dup (cosine >= threshold) with a
    smaller id — the min-id-survivor rule the text dedup family uses,
    applied to embeddings. One anti-join against the pair list; the
    survivor set is deterministic and order-independent."""
    doomed = embedding_near_dup_pairs(
        corpus, threshold, id_col, vec_col, normalized
    ).select(F.col("d2").alias(id_col)).distinct()
    return corpus.join(doomed, id_col, "left_anti")


def _hyperplanes(n_tables: int, n_planes: int, dim: int):
    """Deterministic (seed 42) random hyperplanes, one band per table."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((n_tables, n_planes, dim))


def rp_lsh_signatures(
    df: DataFrame,
    n_tables: int = 16,
    n_planes: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, table, bucket): sign-of-projection LSH. bucket = the
    n_planes sign bits of one table's hyperplane projections packed into an
    int. Projections are ``dot`` HOFs over literal plane arrays — JVM-side,
    linear scan, no shuffle; collision probability per table is
    (1 - theta/pi)^n_planes, boosted by OR-ing n_tables tables."""
    planes = _hyperplanes(n_tables, n_planes, dim)
    tables = []
    for t in range(n_tables):
        bits = None
        for p in range(n_planes):
            lit = F.array(*[F.lit(float(x)) for x in planes[t, p]])
            bit = (dot(F.col(vec_col), lit) > 0).cast("long") * F.lit(1 << p)
            bits = bit if bits is None else bits + bit
        tables.append(F.struct(F.lit(t).alias("table"), bits.alias("bucket")))
    return df.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*tables)).alias("tb")
    ).select(id_col, vec_col, "tb.table", "tb.bucket")


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 16,
    n_planes: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates = corpus vectors sharing
    any (table, bucket) with the query; exact cosine re-rank of candidates.

    The 100 TB shape: the join key space is (table, bucket) — the shuffle
    is linear in corpus × n_tables, and only same-bucket pairs are scored,
    a vanishing fraction of the cross product. Tune recall with
    n_tables (OR) × n_planes (AND)."""
    c = rp_lsh_signatures(corpus, n_tables, n_planes, dim, id_col, vec_col)
    q = rp_lsh_signatures(queries, n_tables, n_planes, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "table", "bucket"
    )
    cands = (
        c.join(q, ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "qvec", F.col(vec_col).alias("cvec"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", _sim(F.col("qvec"), F.col("cvec"), normalized).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
