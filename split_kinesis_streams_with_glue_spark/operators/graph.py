"""Connected components over a pair/edge DataFrame — the clustering step of
near-dup deduplication (pairs → duplicate CLUSTERS → one canonical doc per
cluster).

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round, every node takes the min of its own label and its
neighbors' labels; converged when no label changes. Rounds = graph diameter,
which for near-dup clusters is tiny (dups of the same source text form
near-cliques). Each round is one shuffle keyed on node id.

Scale notes:
- Lineage is truncated per round with ``localCheckpoint(eager=True)`` —
  without it the plan doubles every iteration and the job dies on plan
  explosion long before data size matters (and ``persist`` alone would be a
  plan-time no-op here, see ``minhash`` history).
- For adversarial graphs with long chains (diameter ~ n), swap the
  propagation body for the alternating large-star/small-star rounds of
  Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14)
  — O(log^2 n) rounds with identical per-round shape. Near-dup workloads
  don't need it; the operator caps at ``max_iter`` and reports
  non-convergence rather than looping forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component): component = min node id reachable from ``node``.

    Only nodes that appear in ``edges`` are returned; callers left-join and
    coalesce to make isolated rows their own singleton component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("n"))
        .distinct()
        .withColumn("lbl", F.col("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym["a"] == labels["n"])
            .groupBy(F.col("b").alias("n2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(msgs, labels["n"] == msgs["n2"], "left").select(
            "n",
            "lbl",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                "new_lbl"
            ),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("new_lbl") < F.col("lbl")).count()
        labels = stepped.select("n", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select(F.col("n"), F.col("lbl").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter too large — use large-star/small-star"
    )


def cluster_labels(
    rows: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Attach a ``cluster_id`` to every row: min id of its duplicate
    cluster (rows without any near-dup edge are their own cluster). The
    canonical survivor of each cluster is the row with
    ``cluster_id == id``."""
    cc = connected_components(edges, src, dst)
    return rows.join(
        cc, rows[id_col] == cc["n"], "left"
    ).select(
        *[rows[c] for c in rows.columns],
        F.coalesce(F.col("component"), rows[id_col]).alias("cluster_id"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    n_iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair frame: (node, rank).

    The centrality step after near-dup clustering: within a duplicate/
    similarity graph, rank identifies the most-connected (most
    "canonical") documents, a better survivor heuristic than min-id when
    clusters are large. Classic power iteration, one shuffle per round:
    every node sends rank/degree along each edge, receivers sum and apply
    the damping mix. Undirected graphs are symmetrized, so every node in
    ``edges`` both sends and receives; the fixed iteration count keeps the
    computation ORACLE-CHECKABLE (the same five rounds unroll as chained
    SQL CTEs — no convergence test, no data-dependent control flow).
    Lineage is truncated per round (localCheckpoint) exactly as in
    ``connected_components`` and for the same plan-explosion reason."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("out"))
    n_total = deg.agg(F.count(F.lit(1)).alias("nn"))
    ranks = deg.crossJoin(F.broadcast(n_total)).select(
        F.col("a").alias("node"), (F.lit(1.0) / F.col("nn")).alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        contrib = (
            sym.join(ranks, sym["a"] == ranks["node"])
            .join(deg, "a")
            .select(F.col("b"), (F.col("r") / F.col("out")).alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("b").alias("node"))
            .agg(F.sum("c").alias("recv"))
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("nn")
                    + F.lit(damping) * F.col("recv")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected edge list
    (columns d1 < d2) — the density/clustering statistic for a near-dup
    or entity graph (a surge in triangles = tightly-knit duplicate
    families forming).

    Canonical-order join (the standard distributed formulation): with
    every edge stored as (lo, hi), a triangle a<b<c is counted exactly
    once as e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two equi-joins on edge endpoints,
    no direction double-counting, no per-node adjacency materialization.
    At scale the classic refinement (order endpoints by degree before the
    join, so high-degree hubs sit on the probe side) bounds the join
    fan-out; graphs here are near-dup graphs, which are sparse by
    construction. Returns one row: (n_triangles).
    """
    e1 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    e2 = edges.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    e3 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over an undirected (d1 < d2)
    edge list: 2·tri(v) / (deg(v)·(deg(v)−1)) — how close each node's
    neighborhood is to a clique. On a near-dup graph this separates true
    duplicate FAMILIES (coefficient ≈ 1: everyone matches everyone) from
    hub-like false-positive chains (high degree, low coefficient — the
    signature of an over-broad blocking key worth tightening).

    Same canonical-order two-join as ``triangle_count`` — each a<b<c
    triangle found once, then credited to its three corners with one
    explode; degrees are one unionAll + groupBy. No adjacency-list
    materialization, no direction double-counting."""
    deg = (
        edges.select(F.col("d1").alias("node"))
        .unionAll(edges.select(F.col("d2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    e2 = edges.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    e3 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    per_node = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return deg.join(per_node, "node", "left").select(
        "node",
        F.col("deg").cast("bigint").alias("deg"),
        n_tri.cast("bigint").alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                F.lit(2.0) * n_tri / (F.col("deg") * (F.col("deg") - 1)), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def degree_distribution(edges: DataFrame, src: str = "d1", dst: str = "d2") -> DataFrame:
    """Degree histogram of an undirected pair frame: (degree, n_nodes).
    The one-glance shape diagnostic for a similarity graph — a clean
    dedup graph is dominated by degree 1-2 chains and small cliques; a
    heavy tail of high-degree nodes means a blocking key (or boilerplate
    shingle) is manufacturing hub false-positives that the clustering
    coefficient then has to discriminate away. Symmetrize, one degree
    aggregate, one bounded histogram aggregate; isolated nodes are not in
    the edge list and so not in the histogram (their count is
    |corpus| − Σ n_nodes)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_nodes")
    )


def adjusted_rand_index(
    labels_a: DataFrame,
    labels_b: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "cluster_id",
) -> DataFrame:
    """Adjusted Rand Index between two clusterings of the same id set
    (Hubert & Arabie, J. Classification 1985): pair-counting agreement
    corrected for chance — ARI = (Σ C(n_ij,2) − E) / (½(Σ C(a_i,2) +
    Σ C(b_j,2)) − E) with E = Σ C(a_i,2)·Σ C(b_j,2)/C(n,2). The
    clustering-eval leg the dedup family lacked: blocking_metrics
    grades CANDIDATE PAIRS against truth, but after transitive closure
    the pipeline-level question is "how different are the resulting
    CLUSTERINGS" — threshold sensitivity, LSH-vs-exact drift, algorithm
    swaps — and raw pair overlap is inflated by chance agreement, which
    is exactly what the adjustment removes.

    Exactness and scale shape: one equi-join aligns the two label
    columns, one groupBy builds the (label_a, label_b) contingency
    (bounded by the cluster counts), and every quantity is INTEGER
    combinatorics — C(n,2) = n(n−1) div 2 folded as DECIMAL(38,0)
    (exact, order-free; documented 2^53 contract on the final double
    arithmetic). NULL when the adjustment denominator is zero (both
    clusterings all-singletons or one all-encompassing — ARI is
    undefined there by construction).

    Returns one row (n, n_clusters_a, n_clusters_b, index_pairs,
    expected_pairs, max_pairs, ari)."""
    a = labels_a.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__la")
    )
    b = labels_b.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lb")
    )
    joined = a.join(b, "__id")
    cont = joined.groupBy("__la", "__lb").agg(
        F.count(F.lit(1)).alias("__nij")
    )
    # cast BEFORE the multiply: c*(c-1) in BIGINT overflows (ANSI throw)
    # past c ~ 3e9 members — exactly the corpus scale the op documents
    comb = lambda c: (
        c.cast("decimal(38,0)") * (c.cast("decimal(38,0)") - 1)
    ) / 2

    ai = cont.groupBy("__la").agg(F.sum("__nij").alias("__ai"))
    bj = cont.groupBy("__lb").agg(F.sum("__nij").alias("__bj"))
    idx = cont.agg(
        F.sum(comb(F.col("__nij"))).alias("__idx"),
        F.sum("__nij").alias("__n"),
    )
    ea = ai.agg(
        F.sum(comb(F.col("__ai"))).alias("__ea"),
        F.count(F.lit(1)).alias("__ka"),
    )
    eb = bj.agg(
        F.sum(comb(F.col("__bj"))).alias("__eb"),
        F.count(F.lit(1)).alias("__kb"),
    )
    out = idx.crossJoin(F.broadcast(ea)).crossJoin(F.broadcast(eb))
    nD = F.col("__n").cast("double")
    m = nD * (nD - F.lit(1.0)) / F.lit(2.0)
    ixD = F.col("__idx").cast("double")
    eaD = F.col("__ea").cast("double")
    ebD = F.col("__eb").cast("double")
    expd = eaD * ebD / m
    maxd = (eaD + ebD) / F.lit(2.0)
    return out.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__ka").cast("bigint").alias("n_clusters_a"),
        F.col("__kb").cast("bigint").alias("n_clusters_b"),
        ixD.alias("index_pairs"),
        F.when(m > 0, F.round(expd, 6)).alias("expected_pairs"),
        maxd.alias("max_pairs"),
        F.when(
            (m > 0) & (maxd - expd != 0),
            F.round((ixD - expd) / (maxd - expd), 6),
        ).alias("ari"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "d1",
    dst: str = "d2",
    max_rounds: int = 10,
) -> DataFrame:
    """k-core of an undirected pair frame: the maximal subgraph in which
    every node keeps at least ``k`` neighbors (Seidman, "Network
    structure and minimum degree", Social Networks 1983), via the
    synchronous peel of Batagelj & Zaveršnik, "An O(m) algorithm for
    cores decomposition of networks", 2003 (the parallel/bulk variant:
    each round removes EVERY node whose surviving degree is below k,
    rather than one node at a time — same fixpoint, round count bounded
    by the peel depth). Returns the survivors as (node, core_degree)
    where core_degree counts neighbors INSIDE the core — the k-core
    certificate (every core_degree ≥ k by construction).

    The cohesion gate a similarity/co-occurrence graph needs before
    trusting its clusters: connected_components says "reachable",
    pagerank says "central", the k-core says "mutually dense" — the
    standard dense-subgraph primitive (degeneracy ordering, community
    seeds, spam/bot ring detection in interaction graphs).

    Scale shape: per round, the surviving-degree recount is two hash
    joins of the edge frame against the alive set (both keyed on node
    id — co-partitioned shuffles) plus one aggregate; lineage is
    truncated per round (eager ``localCheckpoint``, the
    connected_components/pagerank idiom) so the plan does not double
    per iteration, and the alive count — a scalar — is the only
    driver-side value. Peeling is MONOTONE (alive never grows), so an
    unchanged count IS the fixpoint proof. Rounds are capped: the peel
    depth of real similarity graphs is tiny (the cascade collapses in
    ≤ ~7 rounds at every tested scale); a cap hit raises rather than
    looping forever, exactly as connected_components."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = sym.select(F.col("a").alias("n")).distinct().localCheckpoint(
        eager=True
    )
    n_alive = alive.count()
    for _ in range(max_rounds):
        deg = (
            sym.join(alive, sym["a"] == alive["n"])
            .drop("n")
            .join(
                alive.withColumnRenamed("n", "m"),
                F.col("b") == F.col("m"),
            )
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        survivors = deg.filter(F.col("core_degree") >= k).localCheckpoint(
            eager=True
        )
        n_next = survivors.count()
        if n_next == n_alive:
            return survivors.select(
                F.col("a").alias("node"),
                F.col("core_degree").cast("bigint").alias("core_degree"),
            )
        alive = survivors.select(F.col("a").alias("n"))
        n_alive = n_next
        if n_alive == 0:
            return survivors.select(
                F.col("a").alias("node"),
                F.col("core_degree").cast("bigint").alias("core_degree"),
            )
    raise RuntimeError(
        f"k_core did not reach a fixpoint within {max_rounds} rounds; "
        f"raise max_rounds (deep peel cascade) or precompute degeneracy "
        f"ordering offline"
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan, Albert &
    Kumara, "Near linear time algorithm to detect community structures
    in large-scale networks", Phys. Rev. E 2007) over an undirected
    pair frame: every node starts labeled with its own id; each round,
    every node simultaneously adopts the label carried by the PLURALITY
    of its neighbors, ties broken toward the SMALLEST label (the
    deterministic stand-in for the paper's random tie-break — random
    choice cannot be oracle-matched across engines).  Returns
    (node, label) after exactly ``rounds`` synchronous rounds, or
    earlier if a round changes no label (a fixpoint — every further
    synchronous round is then a no-op, so the early exit equals the
    full unroll).

    The community primitive the graph family lacked: components say
    "reachable", pagerank says "central", the k-core says "mutually
    dense" — label propagation says "belongs together", the cheap
    communities pass a dedup/retrieval pipeline runs before sampling
    per-community or capping per-cluster contributions.

    CONVERGENCE CONTRACT: synchronous LPA is not monotone and can
    oscillate on bipartite-ish structures (Raghavan et al. §III discuss
    the label oscillation; their fix is asynchronous update order,
    which is inherently sequential).  The operator therefore defines
    its semantics as "the label state after ``rounds`` synchronous
    rounds" — deterministic by construction, identical to the oracle's
    unroll of the same depth — rather than promising a fixpoint.
    Callers wanting converged communities read the ``changed`` signal:
    the early exit above fires only ON a fixpoint.

    Scale shape: per round, one node-keyed join of the symmetric edge
    frame against the current labels, one (node, label) count
    aggregate, and one per-node plurality window (partitioned by node
    — never a global window); lineage is truncated per round with
    eager ``localCheckpoint`` (the connected_components/pagerank/
    k_core idiom) and the only driver-side value per round is the
    scalar changed-label count."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("label"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for r in range(rounds):
        votes = (
            sym.join(labels, sym["b"] == labels["n"])
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        new_labels = (
            votes.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(F.col("a").alias("n"), "label")
            .localCheckpoint(eager=True)
        )
        # the changed-count scan only pays for itself while another
        # round remains to skip — on the final round its value is
        # discarded, so don't run the job (post-wave review)
        if r < rounds - 1:
            changed = (
                new_labels.alias("nw")
                .join(labels.alias("old"), F.col("nw.n") == F.col("old.n"))
                .filter(F.col("nw.label") != F.col("old.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels.select(
        F.col("n").alias("node"), F.col("label").cast("bigint").alias("label")
    )
