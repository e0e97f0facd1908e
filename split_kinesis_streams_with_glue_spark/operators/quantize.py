"""Int8 scalar quantization for embedding columns (X2's storage lever).

At 100 TB the embedding column IS the dataset: a 64-dim float array is
256 bytes/row (plus parquet overhead); symmetric int8 quantization stores
the same vector in 64 bytes + one float scale — a 4x cut in scan bandwidth
and shuffle volume for every downstream similarity op, at a recall cost
that is typically negligible for top-k search (the contract query pins it).

Scheme (symmetric per-vector, the faiss ``SQ8``-style baseline):
``scale = max(|v_i|) / 127``; ``q_i = rint(v_i / scale)`` in [-127, 127].
Reconstruction error is bounded by ``scale / 2`` per component. Dot
products run entirely in integer space —
``dot(a, b) ~= a.scale * b.scale * sum(qa_i * qb_i)`` — and stay inside
whole-stage codegen (``zip_with`` + ``aggregate`` on tinyint arrays, no
UDFs, no Python). 64 dims x 127^2 < 2^21, so INT accumulation cannot
overflow below ~8k dims; we accumulate in INT and cast after.

Everything is narrow (no shuffle): quantization is a per-row map, search
reuses the brute-force/IVF plans with the cheaper integer kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Add ``{prefix}vec`` (array<tinyint>) and ``{prefix}scale`` (float).

    ``rint`` (half-even) keeps the mapping deterministic across engines and
    platforms; all-zero vectors get scale 0 and an all-zero code."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(
        F.col(f"{prefix}scale") == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.rint(x / F.col(f"{prefix}scale")).cast("tinyint"),
        )
    )
    return df.withColumn(f"{prefix}scale", scale.cast("float")).withColumn(
        f"{prefix}vec", q
    )


def dequantize(qvec: Column, qscale: Column) -> Column:
    """Reconstruct the float vector (error <= qscale/2 per component)."""
    return F.transform(qvec, lambda x: x.cast("float") * qscale)


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Approximate dot product in integer space; one multiply per pair at
    the end. The inner sum is INT arithmetic inside codegen."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0),
        lambda s, x: s + x,
    )
    return acc.cast("double") * sa.cast("double") * sb.cast("double")


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """End-to-end quantized ANN: IVF probe pruning + int8 integer-dot
    scoring — the full 100 TB serving plan in one operator.

    The two levers compose: IVF touches only ``nprobe/n_centroids`` of the
    corpus (candidate pruning), and every candidate is scored with the
    integer kernel over stored int8 codes (4x less scan bandwidth than the
    float column; at scale the codes + per-row scale are what you persist,
    so the float embedding column never leaves cold storage on the search
    path). Bucket assignment and query-to-centroid probing stay in float —
    the codebook is k rows, trained/assigned once offline, so quantizing it
    would save nothing and cost recall. Output matches ``ivf_topk``:
    (query_id, neighbor_id, sim, rank) with ``sim`` the reconstructed
    approximate dot ``a.scale * b.scale * sum(qa_i * qb_i)``."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        _sim,
        assign_buckets,
        choose_centroids,
        kmeans_centroids,
    )

    if kmeans_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, kmeans_iters, id_col, vec_col)
    else:
        cents = choose_centroids(corpus, n_centroids, id_col, vec_col)
    # stored representation: bucket + int8 code + scale (float vec dropped)
    coded = quantize_int8(
        assign_buckets(corpus, cents, id_col, vec_col), vec_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "bucket",
        F.col("qvec").alias("c_qvec"),
        F.col("qscale").alias("c_qscale"),
    )
    qq = quantize_int8(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec_f"),
        F.col("qvec").alias("q_qvec"),
        F.col("qscale").alias("q_qscale"),
    )
    probed = qq.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_qvec",
        "q_qscale",
        "centroid_id",
        _sim(F.col("qvec_f"), F.col("centroid_vec"), True).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id")
    )
    probes = (
        probed.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q_qvec", "q_qscale", F.col("centroid_id").alias("bucket"))
    )
    scored = (
        coded.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_dot(
                F.col("q_qvec"),
                F.col("q_qscale"),
                F.col("c_qvec"),
                F.col("c_qscale"),
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k on int8 codes: (query_id, neighbor_id, sim, rank).

    Same plan shape as ``brute_force_topk`` (broadcast queries, one corpus
    scan, per-query window top-k) with the integer kernel — at scale you
    store the codes and never scan the float column at all."""
    qq = quantize_int8(queries, vec_col)
    qc = quantize_int8(corpus, vec_col)
    q = qq.select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qscale").alias("q_qscale"),
    )
    c = qc.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("c_qvec"),
        F.col("qscale").alias("c_qscale"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_dot(
                F.col("q_qvec"),
                F.col("q_qscale"),
                F.col("c_qvec"),
                F.col("c_qscale"),
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
