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
    ``pyspark.ml`` KMeans once and persist the codebook).

    Ids come from ``row_number`` over the explicit id ordering — stable
    under any partitioning (``monotonically_increasing_id`` is only stable
    when the limit collapses to one partition, an accident not a contract)."""
    w = Window.orderBy(F.col(id_col))  # bounded: n_centroids rows post-limit
    return (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col), F.col(vec_col).alias("centroid_vec"))
        .withColumn("centroid_id", F.row_number().over(w) - 1)
        .select("centroid_id", "centroid_vec")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Distributed Lloyd's k-means for the IVF codebook (replaces the min-id
    seeding stand-in as the quality path; ``choose_centroids`` remains the
    deterministic init).

    Per iteration: nearest-centroid assignment (broadcast join + per-vector
    argmax — the same plan IVF probing uses) then the new centroid as the
    element-wise mean via ``posexplode`` → (bucket, pos) average → ordered
    array rebuild — all JVM-side aggregation, no Python, no driver-side
    data. Spherical variant: means are re-normalized so cosine == dot keeps
    holding. Buckets that lose every member drop out (k may shrink);
    centroid ids are re-numbered 0..k-1 by bucket for stability. Cost per
    iteration is one corpus×k broadcast scan plus a corpus×dim shuffle of
    3-column rows — run once offline at scale, then persist the codebook.

    Each iteration's k-row centroid frame is PINNED with
    ``localCheckpoint(eager=False)`` (the raking_ipf/pca_power idiom):
    without the pin, iteration i's assignment crossJoins the corpus
    against a centroid plan whose lineage embeds every PRIOR iteration's
    corpus scan, so the executed plan re-reads the corpus once per Lloyd
    step (the round-11 executed-plan audit measured 21 FileScan leaves in
    the PQ contract query). Pinned, the final plan holds one corpus scan
    plus the bounded checkpointed codebook."""
    cents = choose_centroids(corpus, n_centroids, id_col, vec_col)
    for _ in range(n_iters):
        assigned = assign_buckets(corpus, cents, id_col, vec_col, normalized)
        means = (
            assigned.select("bucket", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("bucket", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("raw")
            )
        )
        norm = F.sqrt(
            F.aggregate("raw", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        cents = means.select(
            F.col("bucket").alias("centroid_id"),
            F.transform("raw", lambda x: x / norm).alias("centroid_vec"),
        ).localCheckpoint(eager=False)
    w = Window.orderBy("centroid_id")  # bounded: k rows
    return cents.withColumn("centroid_id", F.row_number().over(w) - 1)


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
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` buckets nearest each
    query. Recall is tunable via nprobe; exactness is traded for touching
    nprobe/n_centroids of the corpus. ``kmeans_iters > 0`` refines the
    deterministic seed codebook with that many Lloyd iterations (better
    recall at the same nprobe; at scale you train the codebook once and
    persist it rather than re-deriving it per query)."""
    if kmeans_iters > 0:
        cents = kmeans_centroids(
            corpus, n_centroids, kmeans_iters, id_col, vec_col, normalized
        )
    else:
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


def _block_pair_groups(
    corpus: DataFrame, n_blocks: int, id_col: str, vec_col: str
) -> DataFrame:
    """Replicate each vector into every block-pair group that needs it.

    Exact all-pairs decomposition: hash each id into one of ``n_blocks``
    blocks; the unordered pair (u, v) with blocks (i, j) is *owned* by
    exactly the group (min(i,j), max(i,j)). A vector in block b therefore
    joins the n_blocks groups {(min(b,j), max(b,j))}. Replication factor is
    n_blocks; per-group row count is ~2N/n_blocks — the knob that bounds
    executor memory independent of corpus size. Total pairwise work stays
    the exact-minimum N²/2 dot products because each group multiplies only
    its cross-block (or within-block triangular) matrices."""
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    groups = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(j)).alias("g1"),
                F.greatest(F.col("_blk"), F.lit(j)).alias("g2"),
            )
            for j in range(n_blocks)
        ]
    )
    return (
        corpus.select(F.col(id_col), F.col(vec_col), blk.alias("_blk"))
        .select(id_col, vec_col, "_blk", F.explode(groups).alias("_g"))
        .select(id_col, vec_col, "_blk", F.col("_g.g1").alias("_g1"), F.col("_g.g2").alias("_g2"))
    )


def _make_group_pair_fn(id_col, vec_col, normalized, k=None, threshold=None):
    """Build the per-group pandas function (local top-k when ``k`` is set,
    threshold filter when ``threshold`` is set).

    Everything the function touches is nested or a parameter — a
    module-level helper would be cloudpickled BY REFERENCE and the Python
    workers of a session that didn't add this repo to every executor's
    ``sys.path`` (e.g. the external driver harness) would die with
    ModuleNotFoundError importing it."""
    import numpy as np
    import pandas as pd

    def group_pair_sims(pdf):
        """numpy (d1s, d2s, sims) for the pairs OWNED by this group: cross
        matmul between the two blocks, or strict upper triangle within one."""
        g1, g2 = int(pdf["_g1"].iloc[0]), int(pdf["_g2"].iloc[0])

        def side(rows):
            ids = rows[id_col].to_numpy(dtype=np.int64)
            mat = np.array(rows[vec_col].tolist(), dtype=np.float64)
            if not normalized and len(ids):
                mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            return ids, mat

        if g1 == g2:
            ids, mat = side(pdf)
            if len(ids) < 2:
                return None
            sims = mat @ mat.T
            mask = ids[None, :] > ids[:, None]  # strict: d1 < d2 once
            r, c = np.nonzero(mask)
            return ids[r], ids[c], sims[r, c]
        a_ids, a_mat = side(pdf[pdf["_blk"] == g1])
        b_ids, b_mat = side(pdf[pdf["_blk"] == g2])
        if len(a_ids) == 0 or len(b_ids) == 0:
            return None
        sims = a_mat @ b_mat.T  # only cross pairs — no duplicated work
        r, c = np.nonzero(np.ones_like(sims, dtype=bool))
        d1 = np.minimum(a_ids[r], b_ids[c])
        d2 = np.maximum(a_ids[r], b_ids[c])
        return d1, d2, sims[r, c]

    empty = pd.DataFrame({"d1": [], "d2": [], "sim": []}).astype(
        {"d1": "int64", "d2": "int64", "sim": "float64"}
    )

    def fn(pdf):
        out = group_pair_sims(pdf)
        if out is None:
            return empty
        d1, d2, sims = out
        if threshold is not None:
            keep = sims >= threshold
            return pd.DataFrame({"d1": d1[keep], "d2": d2[keep], "sim": sims[keep]})
        n_keep = min(k, len(sims))
        if n_keep == 0:
            return empty
        top = np.argpartition(-sims, n_keep - 1)[:n_keep]
        return pd.DataFrame({"d1": d1[top], "d2": d2[top], "sim": sims[top]})

    return fn


def cosine_pairs_topk(
    corpus: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
    n_blocks: int = 8,
) -> DataFrame:
    """Top-k most-similar distinct pairs (d1 < d2) in the corpus — the
    embedding-cosine near-dup detector in top-k form. EXACT.

    Fully distributed block-pair matmul (no driver collect, no broadcast of
    the corpus): vectors are hashed into ``n_blocks`` blocks, every
    unordered block pair becomes one ``applyInPandas`` group whose task
    multiplies just its two block matrices with BLAS and emits its local
    top-k; a final window picks the global top-k from the bounded
    #groups × k candidate set — exact, since a global top-k pair is top-k
    within its owner group. numpy matmul here beats codegen HOF folds ~10×,
    and per-task memory is (2N/n_blocks)·dim — size ``n_blocks`` ∝ √N to
    hold task memory constant at any corpus size."""
    candidates = (
        _block_pair_groups(corpus, n_blocks, id_col, vec_col)
        .groupBy("_g1", "_g2")
        .applyInPandas(
            _make_group_pair_fn(id_col, vec_col, normalized, k=k),
            "d1 bigint, d2 bigint, sim double",
        )
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
    n_blocks: int = 8,
) -> DataFrame:
    """All distinct pairs (d1 < d2) with cosine >= threshold — the
    embedding-cosine near-dup detector in threshold form. EXACT.

    Same distributed block-pair decomposition as ``cosine_pairs_topk`` (no
    driver collect, no corpus broadcast); each group emits *every* owned
    pair above the threshold, so no final window is needed: the output is
    embarrassingly parallel and its size is bounded by the true near-dup
    count, not a k knob. For billion-vector corpora where even N²/2 dot
    products are too many, the approximate pre-filter is
    ``rp_lsh_signatures`` → same-bucket candidates → this exact check on
    the survivors."""
    return (
        _block_pair_groups(corpus, n_blocks, id_col, vec_col)
        .groupBy("_g1", "_g2")
        .applyInPandas(
            _make_group_pair_fn(id_col, vec_col, normalized, threshold=threshold),
            "d1 bigint, d2 bigint, sim double",
        )
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


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.9,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embedding space, then WITHIN each cluster drop
    every vector that has a lower-id neighbor at cosine >= threshold.
    Quadratic work is confined to clusters — the knob is n_centroids
    (∝ corpus size at scale, so per-cluster cost stays bounded); pairs
    split across clusters are deliberately exempt, which is the accuracy/
    cost trade the method makes vs the exact ``embedding_dedup``.

    Plan: Lloyd codebook (JVM-side) → broadcast nearest-centroid assign →
    per-cluster BLAS matmul via the same ``applyInPandas`` pair kernel the
    exact block decomposition uses (a cluster is a within-block group) →
    one anti-join. No driver-side data, no corpus broadcast."""
    cents = kmeans_centroids(
        corpus, n_centroids, kmeans_iters, id_col, vec_col, normalized
    )
    bucketed = assign_buckets(corpus, cents, id_col, vec_col, normalized)
    pairs = (
        bucketed.select(
            F.col(id_col),
            F.col(vec_col),
            F.col("bucket").alias("_blk"),
            F.col("bucket").alias("_g1"),
            F.col("bucket").alias("_g2"),
        )
        .groupBy("_g1", "_g2")
        .applyInPandas(
            _make_group_pair_fn(id_col, vec_col, normalized, threshold=threshold),
            "d1 bigint, d2 bigint, sim double",
        )
    )
    doomed = pairs.select(F.col("d2").alias(id_col)).distinct()
    return corpus.join(doomed, id_col, "left_anti")


def knn_classify(
    train: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    normalized: bool = True,
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification over an embedding
    column: each query vector takes the modal label of its ``k`` most
    similar training vectors (ties: higher vote count wins, then the
    smaller label — fully deterministic). The label-propagation /
    auto-labeling primitive of a training-data pipeline: a small
    gold-labeled set annotates the rest of the corpus.

    This is the EXACT brute-force baseline (``brute_force_topk``: query
    set broadcast, one corpus scan, per-query partitioned window); at
    corpus scale swap the neighbor source for ``ivf_topk`` — the vote is
    the same two bounded aggregations either way. Returns
    (query_id, pred_label, n_votes)."""
    nn = brute_force_topk(
        train, queries, k=k, id_col=id_col, vec_col=vec_col, normalized=normalized
    )
    labels = train.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).cast("bigint").alias("__nl"),
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "__nl")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # argmax by (votes desc, label asc) via a struct max: negate the label
    # so the lexicographic max realizes the smaller-label tiebreak
    best = votes.groupBy("query_id").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("__nl")).alias("negl"))).alias("b")
    )
    return best.select(
        F.col("query_id"),
        (-F.col("b.negl")).cast("bigint").alias("pred_label"),
        F.col("b.cnt").cast("bigint").alias("n_votes"),
    )


def centroid_purity(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label cluster cohesion audit: each label's centroid (the mean
    vector of its members) and the mean/min cosine of members to their own
    centroid. The label-quality gate for auto-labeled data (e.g.
    ``knn_classify`` output or any clustering): a label whose members
    barely point at their own centroid is incoherent — split it, re-label
    it, or drop it before it poisons a training mix.

    Scale shape: one ``posexplode`` pass builds the (label, dim) → mean
    table (bounded by n_labels × dim — kilobytes); it joins back by
    (label, dim) for the member·centroid dot products, aggregated per
    vector then per label. No vector ever crosses the wire whole except
    in the original row; no driver-side collect; no UDF — the dot product
    is a SUM over exploded lanes, which at 100 TB beats array-HOF row
    math because it map-side combines. Returns (label, n_members,
    mean_cos, min_cos), cosines vs the UNNORMALIZED centroid direction."""
    lanes = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).alias("__lbl"),
        F.posexplode(F.col(vec_col)).alias("__d", "__f"),
    ).withColumn("__v", F.col("__f").cast("double"))
    cent = lanes.groupBy("__lbl", "__d").agg(F.avg("__v").alias("__c"))
    per_vec = (
        lanes.join(cent, ["__lbl", "__d"])
        .groupBy("__id", "__lbl")
        .agg(
            F.sum(F.col("__v") * F.col("__c")).alias("__dot"),
            F.sum(F.col("__v") * F.col("__v")).alias("__nv"),
            F.sum(F.col("__c") * F.col("__c")).alias("__nc"),
        )
    )
    cos = F.when(
        (F.col("__nv") > 0) & (F.col("__nc") > 0),
        F.col("__dot") / F.sqrt(F.col("__nv") * F.col("__nc")),
    )
    return (
        per_vec.select(F.col("__lbl").alias(label_col), cos.alias("__cos"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.avg("__cos"), 6).alias("mean_cos"),
            F.round(F.min("__cos"), 6).alias("min_cos"),
        )
    )


def sample_diversity(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """Diversity audit of an embedding SAMPLE: mean pairwise similarity
    within the sample plus the members' mean cosine to the sample
    centroid. The coverage check run on a candidate training subset —
    two samples with the same size and quality scores can differ wildly
    in redundancy (mean pairwise cosine near 1 = the sample keeps paying
    for the same region), and a mean-centroid cosine near 1 says the
    sample collapsed to one mode of the corpus.

    By contract ``df`` IS the sample (pick it upstream with the
    content-hash samplers — deterministic and engine-portable); the pair
    enumeration is quadratic in the SAMPLE, never the corpus. Pairwise
    sims are row-local array folds over the pair join; the centroid leg
    reuses the bounded-lane shape of ``centroid_purity``. Returns one row
    (n_sample, mean_pairwise_sim, mean_centroid_cos)."""
    a = df.select(F.col(id_col).alias("__i1"), F.col(vec_col).alias("__v1"))
    b = df.select(F.col(id_col).alias("__i2"), F.col(vec_col).alias("__v2"))
    pair_sim = (
        a.join(b, F.col("__i1") < F.col("__i2"))
        .select(_sim(F.col("__v1"), F.col("__v2"), normalized).alias("__s"))
        .agg(F.avg("__s").alias("__mps"))
    )
    cent = centroid_purity(
        df.withColumn("__one", F.lit(0)),
        id_col=id_col,
        vec_col=vec_col,
        label_col="__one",
    ).select(
        F.col("n_members").alias("n_sample"),
        F.col("mean_cos").alias("mean_centroid_cos"),
    )
    return cent.crossJoin(F.broadcast(pair_sim)).select(
        "n_sample",
        F.round("__mps", 6).alias("mean_pairwise_sim"),
        "mean_centroid_cos",
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    normalized: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the ``k``
    most similar corpus vectors carrying a DIFFERENT label — the
    'confusable but wrong' examples that make a contrastive/triplet
    objective learn anything (random negatives are trivially separable
    and teach nothing). The filter must run BEFORE the ranking —
    ``brute_force_topk`` then a label filter would silently return fewer
    (or zero) negatives whenever a query's true neighborhood is pure.

    Same scale shape as the exact kNN path: the query set broadcasts,
    one corpus scan scores everything, the per-query window ranks only
    different-label candidates; swap the neighbor source for the ANN
    family at corpus scale. Returns (query_id, neighbor_id,
    neighbor_label, sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlbl"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("qlbl"))
        )
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            _sim(F.col("qvec"), F.col("cvec"), normalized).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def norm_audit(
    df: DataFrame, vec_col: str = "embedding", tol: float = 1e-3
) -> DataFrame:
    """Embedding-norm audit: L2-norm distribution plus the count of
    vectors off unit norm by more than ``tol``. The one-row precondition
    check for this module's ``normalized=True`` fast path (cosine == dot)
    — an upstream model change that stops normalizing silently corrupts
    every similarity, dedup threshold and ANN recall contract downstream;
    this query is the tripwire. One row-local array fold per vector, one
    aggregate."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    base = df.select(norm.alias("__n"))
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.min("__n"), 6).alias("min_norm"),
        F.round(F.avg("__n"), 6).alias("mean_norm"),
        F.round(F.max("__n"), 6).alias("max_norm"),
        F.sum((F.abs(F.col("__n") - 1.0) > tol).cast("int"))
        .cast("bigint")
        .alias("n_off_unit"),
    )


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 6,
) -> DataFrame:
    """Top principal component of an embedding column by FIXED-count
    power iteration — the embedding-quality lens the audit family
    lacked: the dominant variance direction and its explained-variance
    share tell a curator whether a corpus' embeddings carry one
    overwhelming axis (a length/formatting artifact eats the geometry;
    ANN recall and cosine thresholds quietly degrade) or spread healthy
    variance. Pairs with ``norm_audit`` (scale pathologies) and
    ``sample_diversity`` (mean-pairwise geometry).

    Shape, stage by stage, all DataFrame ops (no driver-side linear
    algebra, no collect):
    - the (id, pos, value) explode self-joins ON ID and partially
      aggregates to the d x d raw-moment frame — n·d² products with
      map-side combine, the one data-sized stage (the classical
      sufficient-statistics pass; at extreme n, per-partition Gram
      folds via mapInPandas drop the join constant but not the
      asymptotics);
    - covariance = moments/n − outer(mean/n) on the bounded d² frame;
    - ``n_iters`` unrolled Jacobi-free iterations v ← C·v / ‖C·v‖, each
      a d²-row join + d-row aggregate + 1-row norm broadcast. The
      iteration count is FIXED so the whole computation is a
      deterministic dataflow — oracle-checkable as unrolled SQL CTEs,
      no convergence test, no data-dependent control flow (same design
      as the fixed-round PageRank/connected-components operators).
    - Rayleigh quotient λ = vᵀCv and trace(C) fold from the same
      bounded frames.

    The start vector is the exact dyadic 1/8·1 (deterministic sign);
    float sums across engines differ in the last ulp but power
    iteration is contractive toward the dominant eigenvector, so the
    differences do not amplify — outputs round to 6 decimals.

    Returns d rows: (pos, loading, eigenvalue, explained_share)."""
    x = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col)).alias("__p", "__xv"),
    ).select("__id", "__p", F.col("__xv").cast("double").alias("__xv"))
    cnt = df.agg(F.count(F.lit(1)).alias("__cnt"))
    mean = x.groupBy("__p").agg(F.sum("__xv").alias("__sx"))
    xa = x.select("__id", F.col("__p").alias("__pa"), F.col("__xv").alias("__va"))
    xb = x.select("__id", F.col("__p").alias("__pb"), F.col("__xv").alias("__vb"))
    moments = (
        xa.join(xb, "__id")
        .groupBy("__pa", "__pb")
        .agg(F.sum(F.col("__va") * F.col("__vb")).alias("__spq"))
    )
    cov = (
        moments.join(
            mean.select(F.col("__p").alias("__pa"), F.col("__sx").alias("__sa")),
            "__pa",
        )
        .join(
            mean.select(F.col("__p").alias("__pb"), F.col("__sx").alias("__sb")),
            "__pb",
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            "__pa",
            "__pb",
            (
                F.col("__spq") / F.col("__cnt")
                - (F.col("__sa") / F.col("__cnt"))
                * (F.col("__sb") / F.col("__cnt"))
            ).alias("__c"),
        )
        # the covariance frame is d^2 rows but its PARENT is the n*d^2
        # corpus pass; every iteration below references it, so without a
        # materialization point the plan recomputes that pass per matvec
        # (7 corpus scans). Lazy local checkpoint = compute once on first
        # use, same values (identical single evaluation), no job at
        # build time — the same lineage-truncation pattern as
        # connected_components
        .localCheckpoint(eager=False)
    )
    # seed from the PINNED cov frame, not `mean` — mean's lineage is the
    # corpus scan, and each iteration below references v twice (directly
    # and through the norm aggregate), so a corpus-rooted v re-embeds the
    # scan 2^n_iters times (the raking_ipf class; caught by the
    # scan-multiplicity lint gate). The position set is identical.
    v = (
        cov.select(F.col("__pa").alias("__p"))
        .distinct()
        .select("__p", F.lit(0.125).alias("__v"))
    )
    for _ in range(n_iters):
        w = (
            cov.join(
                v.select(F.col("__p").alias("__pb"), "__v"), "__pb"
            )
            .groupBy("__pa")
            .agg(F.sum(F.col("__c") * F.col("__v")).alias("__w"))
        )
        nm = w.agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__nm"))
        v = (
            w.crossJoin(F.broadcast(nm))
            .select(
                F.col("__pa").alias("__p"),
                (F.col("__w") / F.col("__nm")).alias("__v"),
            )
            # d-row frame; truncates the doubled-per-iteration lineage
            .localCheckpoint(eager=False)
        )
    wf = (
        cov.join(v.select(F.col("__p").alias("__pb"), "__v"), "__pb")
        .groupBy("__pa")
        .agg(F.sum(F.col("__c") * F.col("__v")).alias("__w"))
    )
    lam = (
        v.join(wf.select(F.col("__pa").alias("__p"), "__w"), "__p")
        .agg(F.sum(F.col("__v") * F.col("__w")).alias("__lam"))
    )
    tr = cov.filter(F.col("__pa") == F.col("__pb")).agg(
        F.sum("__c").alias("__tr")
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("__p").cast("int").alias("pos"),
            # + 0.0 canonicalizes a rounded -0.0 to +0.0 in both engines
            (F.round("__v", 6) + F.lit(0.0)).alias("loading"),
            F.round("__lam", 6).alias("eigenvalue"),
            F.round(F.col("__lam") / F.col("__tr"), 6).alias("explained_share"),
        )
    )


def mmr_select(
    candidates: DataFrame,
    query: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``k`` items maximizing
    ``lam*rel(c) − (1−lam)*max_{s∈S} sim(c, s)`` — relevant to the
    query but NOT redundant with what is already selected. The
    diverse-subset primitive the retrieval family lacked: top-k by
    similarity alone returns k paraphrases; MMR returns k relevant but
    mutually-distinct items (few-shot example pools, eval-set
    selection, dedup-aware retrieval).

    Greedy selection is inherently sequential, so the k rounds unroll
    into a deterministic dataflow (the fixed-iteration pattern shared
    with ``top_principal_component``): each round anti-joins the
    selected ids out, broadcasts the ≤k selected vectors against the
    candidate pool for the max-similarity term, and takes the arg-max
    via a TakeOrderedAndProject on the ROUNDED score with the id as
    tiebreak — reproducible in any engine because ``dot`` is the same
    left-to-right double fold the SQL oracle spells out. MMR is a
    RE-RANKER: run it on a retrieved candidate set (top-N from
    ANN/BM25), never the raw corpus — cost is k passes over the
    candidate pool.

    ``query`` is a 1-row frame carrying ``vec_col``. Returns k rows
    (step, id, relevance, mmr_score)."""
    q = query.select(F.col(vec_col).alias("__qv"))
    cand = candidates.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__cv")
    ).crossJoin(F.broadcast(q)).select(
        "__id", "__cv", dot("__cv", "__qv").alias("__rel")
    )
    lam_c = F.lit(lam)
    picks: list[DataFrame] = []
    for step in range(1, k + 1):
        if not picks:
            scored = cand.select(
                "__id", "__cv", "__rel", (lam_c * F.col("__rel")).alias("__score")
            )
        else:
            sel = picks[0]
            for p in picks[1:]:
                sel = sel.unionByName(p)
            sel_ids = sel.select("__id")
            sel_vecs = sel.select(F.col("__cv").alias("__sv"))
            remaining = cand.join(sel_ids, "__id", "left_anti")
            scored = (
                remaining.crossJoin(F.broadcast(sel_vecs))
                .groupBy("__id")
                .agg(
                    F.first("__cv").alias("__cv"),
                    F.first("__rel").alias("__rel"),
                    F.max(dot("__cv", "__sv")).alias("__ms"),
                )
                .select(
                    "__id",
                    "__cv",
                    "__rel",
                    (
                        lam_c * F.col("__rel")
                        - (F.lit(1.0) - lam_c) * F.col("__ms")
                    ).alias("__score"),
                )
            )
        pick = (
            scored.orderBy(
                F.round("__score", 6).desc(), F.col("__id").asc()
            )
            .limit(1)
            .select(
                F.lit(step).alias("__step"), "__id", "__cv", "__rel", "__score"
            )
            .localCheckpoint(eager=False)  # 1-row frame; truncates the
            # per-round lineage so round t's plan doesn't re-nest rounds 1..t-1
        )
        picks.append(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("__step").cast("int").alias("step"),
        F.col("__id").alias(id_col),
        F.round("__rel", 6).alias("relevance"),
        F.round("__score", 6).alias("mmr_score"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    merge several retrieval rankings into one by summing ``1/(k0+rank)``
    across the lists each item appears in. The hybrid-retrieval
    primitive the family lacked — BM25 and embedding-cosine each rank
    well alone, but their SCORES are incommensurable (log-idf sums vs
    unit dot products); RRF fuses on RANKS, so no per-list score
    calibration is needed and an item strong in either modality
    surfaces. ``k0 = 60`` is the paper's constant.

    Each input frame is a CANDIDATE LIST ``(id_col, score_col)`` — the
    bounded top-N output of a retriever (BM25 top-N, ANN top-N), never
    a raw corpus, so the per-list rank window runs over ≤ N rows.
    Ranks order by the ROUNDED score (6 dp) descending with the id as
    tiebreak, and the fused score folds the exact reciprocals 1/(k0+r)
    in ASCENDING-rank order (``aggregate`` over a sorted rank array, not
    ``F.sum`` — double addition is order-dependent, and a grouped SUM's
    accumulation order is nondeterministic for 3+ lists), so the fusion
    is bit-reproducible in any engine at any list count. Output:
    top-``k`` rows (id, rrf_score, n_lists, best_rank) via a
    TakeOrderedAndProject on the rounded fusion score."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col).alias("__id"),
            F.round(F.col(score_col), 6).alias("__s"),
            F.lit(i).alias("__list"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    w = Window.partitionBy("__list").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    ranked = tagged.select(
        "__id", "__list", F.row_number().over(w).alias("__r")
    )
    fused = ranked.groupBy("__id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("__r")),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / (F.lit(k0) + r),
        ).alias("__rrf"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.min("__r").cast("int").alias("best_rank"),
    )
    return (
        fused.orderBy(F.round("__rrf", 6).desc(), F.col("__id").asc())
        .limit(k)
        .select(
            F.col("__id").alias(id_col),
            F.round("__rrf", 6).alias("rrf_score"),
            "n_lists",
            "best_rank",
        )
    )


def mmd_linear(
    df: DataFrame,
    group_col: str,
    group_x,
    group_y,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sigma_sq: float = 1.0,
) -> DataFrame:
    """Linear-time estimator of squared Maximum Mean Discrepancy between
    two embedding populations (Gretton et al., JMLR 2012, lemma 14):
    MMD_l^2 = mean over quads (x1,x2,y1,y2) of
    h = k(x1,x2) + k(y1,y2) - k(x1,y2) - k(x2,y1) with an RBF kernel
    k(a,b) = exp(-||a-b||^2 / (2*sigma_sq)). The distribution-level
    two-sample test the embedding family lacked: centroid distance sees
    only the first moment and cosine audits are pairwise — MMD responds
    to ANY distributional difference the kernel can see, and the linear
    form needs one pass over paired rows, never the quadratic kernel
    matrix (the 100 TB contract: O(n) kernel evaluations).

    Determinism: quads pair consecutive rows in ``id_col`` order within
    each group (row_number DIV 2), so the estimate is a fixed function
    of the data, not of partitioning; unpaired tails drop. Distances
    expand as |a|^2 + |b|^2 - 2*(a.b) over the module's left-to-right
    double folds; the final mean is one bounded aggregate.

    Returns one row (n_pairs, mmd2_linear)."""
    g = F.col(group_col)
    base = df.filter(g.isin(group_x, group_y)).select(
        F.when(g == group_x, F.lit("x")).otherwise(F.lit("y")).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    )
    w = Window.partitionBy("__g").orderBy("__id")
    numbered = base.select(
        "__g",
        "__v",
        ((F.row_number().over(w) - 1) / 2).cast("bigint").alias("__q"),
        ((F.row_number().over(w) - 1) % 2).cast("int").alias("__slot"),
    )
    # one row per (quad, side): x-pairs and y-pairs land on the same __q
    wide = (
        numbered.groupBy("__q", "__g")
        .agg(
            F.max(F.when(F.col("__slot") == 0, F.col("__v"))).alias("__a"),
            F.max(F.when(F.col("__slot") == 1, F.col("__v"))).alias("__b"),
        )
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    )
    xs = wide.filter(F.col("__g") == "x").select(
        "__q", F.col("__a").alias("__x1"), F.col("__b").alias("__x2")
    )
    ys = wide.filter(F.col("__g") == "y").select(
        "__q", F.col("__a").alias("__y1"), F.col("__b").alias("__y2")
    )
    quads = xs.join(ys, "__q")

    def rbf(a, b):
        d2 = dot(a, a) + dot(b, b) - F.lit(2.0) * dot(a, b)
        return F.exp(-d2 / F.lit(2.0 * sigma_sq))

    h = (
        rbf(F.col("__x1"), F.col("__x2"))
        + rbf(F.col("__y1"), F.col("__y2"))
        - rbf(F.col("__x1"), F.col("__y2"))
        - rbf(F.col("__x2"), F.col("__y1"))
    )
    return quads.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(h), 6).alias("mmd2_linear"),
    )


def silhouette_simplified(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified silhouette coefficient per cluster (Hruschka et al.'s
    centroid variant of Rousseeuw 1987): for each point, a = distance to
    its OWN cluster centroid, b = distance to the NEAREST OTHER
    centroid, s = (b - a) / max(a, b); report per-cluster mean s and
    size. The cluster-quality audit that scales: the classic silhouette
    is O(n^2) pairwise; the centroid form is one broadcast join against
    k centroids — O(n*k) kernel work, the same contract as IVF
    assignment, honest at any corpus size.

    Centroids are exact per-label means (one grouped pass over
    zip_with-summed arrays); distances expand through the module's
    deterministic double folds. Points in singleton clusters still score
    (a = distance to their own mean = 0 for a true singleton). Returns
    per-cluster rows (label, n, mean_silhouette) ordered nowhere —
    callers sort.

    Degenerate inputs (round-9 advice): the dimension probe is a 1-row
    ``first()`` — metadata-bounded like the family's other probes, but
    eager, so an EMPTY frame is rejected here with a clear ValueError
    instead of a TypeError from ``None[...]``. A single-cluster input
    returns an EMPTY frame by construction — the silhouette needs a
    nearest OTHER centroid, and with k = 1 the b-side join finds no
    rows; callers wanting a defined k = 1 answer should treat "empty
    result" as "silhouette undefined", per Rousseeuw's own convention.
    """
    dim_probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_probe is None or dim_probe["d"] is None:
        raise ValueError(
            "silhouette_simplified needs at least one row with a non-NULL "
            f"{vec_col!r} array to probe the embedding dimension"
        )
    d = int(dim_probe["d"])
    cents = (
        df.groupBy(F.col(label_col).alias("__cl"))
        .agg(
            F.array(
                *[
                    F.avg(F.col(vec_col)[i].cast("double")).alias(f"c{i}")
                    for i in range(d)
                ]
            ).alias("__cent")
        )
    )
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).alias("__lbl"),
        F.col(vec_col).alias("__v"),
    )
    joined = pts.join(F.broadcast(cents), how="cross")

    dist = F.sqrt(
        F.greatest(
            dot(F.col("__v"), F.col("__v"))
            + dot(F.col("__cent"), F.col("__cent"))
            - F.lit(2.0) * dot(F.col("__v"), F.col("__cent")),
            F.lit(0.0),
        )
    )
    scored = joined.select(
        "__id",
        "__lbl",
        "__cl",
        dist.alias("__dist"),
    )
    a = scored.filter(F.col("__lbl") == F.col("__cl")).select(
        "__id", "__lbl", F.col("__dist").alias("__a")
    )
    b = (
        scored.filter(F.col("__lbl") != F.col("__cl"))
        .groupBy("__id")
        .agg(F.min("__dist").alias("__b"))
    )
    s = a.join(b, "__id").select(
        "__lbl",
        (
            (F.col("__b") - F.col("__a"))
            / F.greatest(F.col("__a"), F.col("__b"))
        ).alias("__s"),
    )
    return s.groupBy(F.col("__lbl").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("__s"), 6).alias("mean_silhouette"),
    )


def sliced_wasserstein(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    n_slices: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sliced 1-Wasserstein distance (Rabin et al., SSVM 2011; Bonneel
    et al., JMIV 2015) between two groups of embeddings: project both
    onto ``n_slices`` fixed directions and take the EXACT 1-D
    Wasserstein distance per slice. The embedding-distribution drift
    measure the similarity family lacked: sim_mmd_linear answers "are
    these two sets different" as one kernel statistic, while sliced-W1
    reports HOW FAR apart they are in embedding units per direction —
    the metric that moves proportionally when an encoder update or a
    source swap shifts the embedding cloud.

    Determinism is inherited from two proven recipes composed here:
    the projection directions are the quantize module's md5-derived ±1
    sign matrix scaled by 1/sqrt(dim) (sim_random_projection's exact
    cross-engine form; randomness = pure hash), with projections
    ROUNDED to 6 dp so the distinct-value histograms agree bitwise;
    each slice then runs quality_checks.wasserstein_1d's gap-weighted
    ECDF fold over that bounded histogram. Per-slice cost is one scan
    projection + a histogram-sized window — n_slices is a constant, so
    the whole operator is a constant number of linear passes.

    Returns one row per slice (slice_id, n_a, n_b, n_support,
    w1_distance) — average externally if a scalar is wanted; the
    per-slice profile localizes WHICH directions drifted."""
    from split_kinesis_streams_with_glue_spark.functions.vectors import dot
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        wasserstein_1d,
    )
    from split_kinesis_streams_with_glue_spark.operators.quantize import (
        projection_signs,
    )

    signs = projection_signs(dim, n_slices)
    scale = 1.0 / (dim ** 0.5)
    out = None
    for j in range(n_slices):
        lit = F.array(*[F.lit(float(s)) for s in signs[j]])
        proj = F.round(dot(F.col(vec_col), lit) * F.lit(scale), 6)
        pf = df.select(proj.alias("__p"), F.col(group_col).alias("__g"))
        one = wasserstein_1d(pf, "__p", "__g", group_a, group_b).select(
            F.lit(j).cast("bigint").alias("slice_id"),
            "n_a",
            "n_b",
            "n_support",
            "w1_distance",
        )
        out = one if out is None else out.unionByName(one)
    return out


def calinski_harabasz(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Calinski–Harabasz variance-ratio criterion (Caliński & Harabasz,
    "A dendrite method for cluster analysis", Communications in
    Statistics 1974): CH = [B/(k−1)] / [W/(N−k)] with B = Σ_j n_j·
    ‖c_j − c‖² (between-cluster dispersion) and W = Σ_j Σ_{x∈j}
    ‖x − c_j‖² (within-cluster dispersion). The GLOBAL cluster-validity
    companion of sim_silhouette_simplified: silhouette scores each
    point (needs point↔centroid distances), CH prices the whole
    clustering in one ratio — the standard knob for choosing k before
    committing a SemDeDup/coreset pass to a partitioning.

    Scale shape: one posexplode pass collapses the corpus to the
    k×dims (cluster, dim) moment frame — per-cell Σv and Σv² as
    9-dp-rounded DECIMAL(38,9) sums — and that frame is PINNED with
    ``localCheckpoint(eager=False)`` (the raking_ipf/brown_forsythe
    idiom, round-10 ADVICE) because it feeds multiple plan branches
    (``joined`` and ``globald``); ``sizes`` is pinned for the same
    reason (it feeds ``tot`` and the broadcast join). Without the pins
    each re-aggregation re-embeds the corpus posexplode scan (~4
    corpus scans in the executed plan). W uses the Σv² − (Σv)²/n
    identity per cell and B needs only the broadcast per-dim global
    sums; no point-to-centroid join ever materializes. CH is NULL when
    k < 2, N ≤ k, or W = 0 (the ratio is undefined)."""
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(label_col).alias("__l"), F.col(vec_col).alias("__e"))
    sizes = (
        base.groupBy("__l")
        .agg(F.count(F.lit(1)).alias("__nj"))
        .localCheckpoint(eager=False)
    )
    tot = sizes.agg(
        F.sum("__nj").alias("__nrows"), F.count(F.lit(1)).alias("__k")
    )
    pos = base.select(
        "__l", F.posexplode(F.col("__e")).alias("__d", "__v")
    ).select("__l", "__d", F.col("__v").cast("double").alias("__v"))
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")
    cell = pos.groupBy("__l", "__d").agg(
        dsum(F.col("__v")).alias("__s"),
        dsum(F.col("__v") * F.col("__v")).alias("__ss"),
    ).localCheckpoint(eager=False)
    globald = cell.groupBy("__d").agg(
        F.sum(F.col("__s").cast("decimal(38,9)")).cast("double").alias("__sd")
    )
    joined = (
        cell.join(F.broadcast(sizes), "__l")
        .join(F.broadcast(globald), "__d")
        .crossJoin(F.broadcast(tot))
    )
    cld = F.col("__s") / F.col("__nj").cast("double")
    cd = F.col("__sd") / F.col("__nrows").cast("double")
    a = joined.agg(
        F.max("__nrows").cast("bigint").alias("n"),
        F.max("__k").cast("bigint").alias("n_clusters"),
        (F.countDistinct("__d")).cast("bigint").alias("n_dims"),
        dsum(F.col("__nj").cast("double") * (cld - cd) * (cld - cd)).alias(
            "__b"
        ),
        dsum(
            F.col("__ss")
            - F.col("__s") * F.col("__s") / F.col("__nj").cast("double")
        ).alias("__w"),
    )
    k = F.col("n_clusters").cast("double")
    nD = F.col("n").cast("double")
    return a.select(
        "n",
        "n_clusters",
        "n_dims",
        F.round(F.col("__b"), 6).alias("ss_between"),
        F.round(F.col("__w"), 6).alias("ss_within"),
        F.when(
            (F.col("n_clusters") >= 2)
            & (F.col("n") > F.col("n_clusters"))
            & (F.col("__w") > 0),
            F.round(
                (F.col("__b") / (k - F.lit(1.0)))
                / (F.col("__w") / (nD - k)),
                6,
            ),
        ).alias("ch_index"),
    )
