"""Unit tests for round-3 scale operators: count-min sketch, Bloom filter,
Z-order layout, one-pass profiler, snapshot time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.operators.layout import (
    bounding_boxes,
    with_zvalue,
    zorder_repartition,
)
from split_kinesis_streams_with_glue_spark.operators.profile import profile_table
from split_kinesis_streams_with_glue_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
)


# ---------------------------------------------------------------- count-min


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    df = spark.range(2000).select(
        (F.col("id") % 37).cast("string").alias("k")
    )
    sketch = cms_build(df, "k", depth=5, width=1024)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact, "k", depth=5, width=1024)
    rows = est.collect()
    assert len(rows) == 37
    assert all(r["cms_estimate"] >= r["n"] for r in rows)
    # 37 keys in 1024 buckets x 5 rows: collisions essentially impossible
    assert all(r["cms_estimate"] == r["n"] for r in rows)


def test_cms_merge_is_union_resum(spark):
    """Merging two sketches (union + re-sum) must equal the sketch of the
    concatenated input — the property that makes per-partition/per-day
    sketches composable."""
    a = spark.range(500).select((F.col("id") % 11).cast("string").alias("k"))
    b = spark.range(300).select((F.col("id") % 7).cast("string").alias("k"))
    merged = (
        cms_build(a, "k").unionByName(cms_build(b, "k"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_estimate_of_absent_key_is_bounded_not_negative(spark):
    df = spark.range(100).select((F.col("id") % 5).cast("string").alias("k"))
    sketch = cms_build(df, "k", depth=5, width=2048)
    probe = spark.createDataFrame([("never-seen",)], ["k"])
    [row] = cms_estimate(sketch, probe, "k", depth=5, width=2048).collect()
    assert 0 <= row["cms_estimate"] <= 100


# ------------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_structural(spark):
    members = spark.range(1000).select(
        F.concat(F.lit("m"), F.col("id")).alias("k")
    )
    m_bits, k_hashes = 1 << 16, 8
    bloom = bloom_build(members, "k", m_bits, k_hashes)
    hit = (
        members.crossJoin(F.broadcast(bloom))
        .select(
            bloom_might_contain(F.col("bloom"), F.col("k"), m_bits, k_hashes).alias(
                "hit"
            )
        )
        .agg(F.min("hit").alias("all_hit"))
        .collect()[0]["all_hit"]
    )
    assert hit is True


def test_bloom_false_positive_rate_within_theory(spark):
    members = spark.range(1000).select(
        F.concat(F.lit("m"), F.col("id")).alias("k")
    )
    probes = spark.range(5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("k")
    )
    m_bits, k_hashes = 1 << 16, 8  # m/n ~ 65 -> theoretical FP ~ 1e-7
    bloom = bloom_build(members, "k", m_bits, k_hashes)
    fp = (
        probes.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("bloom"), F.col("k"), m_bits, k_hashes))
        .count()
    )
    assert fp <= 5  # generous vs theory; catches broken hashing/bit math


def test_bloom_merge_is_bitor(spark):
    """Two filters over the same (m, k) OR together into the filter of the
    union — partition-local builds compose without rescans."""
    a = spark.range(100).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(100).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    m_bits, k_hashes = 1 << 14, 6

    def words(df):
        return df.select(F.explode(F.map_entries(F.col("bloom"))).alias("e")).select(
            F.col("e.key").alias("word"), F.col("e.value").alias("bits")
        )

    merged = (
        words(bloom_build(a, "k", m_bits, k_hashes))
        .unionByName(words(bloom_build(b, "k", m_bits, k_hashes)))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = words(bloom_build(a.unionByName(b), "k", m_bits, k_hashes))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


# ----------------------------------------------------------------- z-order


def test_zvalue_locality_small_grid(spark):
    """Morton basics: the z-value of grid-adjacent cells differs less, on
    average, than random pairs — spot-check the interleave with known
    values: (0,0)=0, (1,0)=1, (0,1)=2, (1,1)=3 on a 2x2 corner."""
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], ["a", "b"]
    )
    rows = {
        (r["a"], r["b"]): r["zval"]
        for r in with_zvalue(df, "a", "b").collect()
    }
    # bounds 0..3 scale to grid cells {0, 21845, 43690, 65535}; the two
    # low bits of the cell index land in the two low interleaved bits
    assert rows[(0, 0)] == 0
    assert rows[(3, 3)] == (1 << 32) - 1  # all 32 bits set
    assert rows[(3, 0)] < rows[(3, 3)]
    assert rows[(0, 3)] < rows[(3, 3)]


def test_zorder_layout_prunes_secondary_dimension(spark):
    """The point of the curve: a predicate on the SECOND dimension alone
    must intersect fewer z-ordered partitions than linearly-sorted ones
    (where every partition spans the full b range)."""
    n, parts = 64, 16
    df = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(n)], ["a", "b"]
    )
    z = zorder_repartition(df, "a", "b", parts)
    linear = df.repartitionByRange(parts, "a").sortWithinPartitions("a")
    lo, hi = 8, 15  # an n/8-wide slice of b

    def intersecting(frame):
        boxes = bounding_boxes(frame, "a", "b").collect()
        return sum(1 for r in boxes if r["min_b"] <= hi and r["max_b"] >= lo)

    n_linear = intersecting(linear)
    n_z = intersecting(z)
    assert n_linear == parts  # every linear partition spans all of b
    assert n_z < parts / 2  # curve blocks: most partitions skippable


def test_zvalue_constant_dimension_is_safe(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], ["a", "b"])
    vals = [r["zval"] for r in with_zvalue(df, "a", "b").collect()]
    assert len(vals) == 10  # constant b -> grid cell 0, no div-by-zero


# ---------------------------------------------------------------- profiler


def test_profile_one_pass_metrics(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (2, "bbbb")], ["k", "s"]
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    k, s = rows["k"], rows["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 2)
    assert (k["min_s"], k["max_s"], k["sum_len"]) == ("1", "2", 3)
    assert (s["n_nulls"], s["n_distinct"], s["sum_len"]) == (1, 2, 6)
    assert (s["min_s"], s["max_s"]) == ("aa", "bbbb")


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "k int, s string")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_rows"] == 0
    assert rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 0
    assert rows["k"]["min_s"] is None


def test_profile_is_single_job_plan(spark):
    """The profiler must stay ONE aggregation job: the plan contains the
    scan once (Expand handles the multi-distinct), not once per column."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1


# ------------------------------------------------------------- time travel


def test_time_travel_reads_any_published_version(spark, tmp_path):
    from split_kinesis_streams_with_glue_spark.operators.publish import (
        current_version,
        read_version,
        write_audit_publish,
    )
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        completeness,
    )

    path = str(tmp_path / "t")
    df1 = spark.range(5).select(F.col("id").alias("k"))
    df2 = spark.range(9).select(F.col("id").alias("k"))
    v1 = write_audit_publish(df1, path, [completeness("k")])
    v2 = write_audit_publish(df2, path, [completeness("k")])
    assert current_version(spark, path) == v2
    assert read_version(spark, path, v1).count() == 5
    assert read_version(spark, path, v2).count() == 9
    with pytest.raises(Exception):
        read_version(spark, path, 99)


# ------------------------------------------------------- product quantization


def test_pq_codebook_and_code_shapes(spark):
    from split_kinesis_streams_with_glue_spark.operators.quantize import (
        pq_encode,
        pq_train,
    )

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.col("id") % 4 + i).cast("float"),
        ).alias("embedding"),
    )
    cb = pq_train(df, m=4, ksub=4, n_iters=1)
    rows = cb.collect()
    assert {r["j"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["cvec"]) == 2 for r in rows)  # dsub = 8/4
    codes = pq_encode(df, cb, m=4).collect()
    assert all(len(r["code"]) == 4 for r in codes)
    assert all(0 <= c < 4 for r in codes for c in r["code"])


def test_pq_exact_on_cluster_structured_data(spark):
    """Vectors drawn exactly FROM a small set of distinct patterns must be
    encoded losslessly once the codebook converges — ADC then returns the
    true dot products and top-k equals brute force."""
    from split_kinesis_streams_with_glue_spark.operators.quantize import pq_topk
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        brute_force_topk,
    )

    # 4 distinct vectors repeated 10x: ksub=4 centroids per subspace suffice
    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: ((F.col("id") % 4) * i).cast("float"),
        ).alias("embedding"),
    )
    queries = df.filter(F.col("vec_id") < 2)
    pq = pq_topk(df, queries, k=5, m=4, ksub=4, n_iters=3, refine=0)
    # with a lossless codebook the ADC score IS the true dot product —
    # check every returned sim against the exact dot of the two vectors
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    rows = pq.collect()
    assert len(rows) == 10
    for r in rows:
        true_dot = sum(
            x * y for x, y in zip(vecs[r["query_id"]], vecs[r["neighbor_id"]])
        )
        assert abs(r["sim"] - true_dot) < 1e-3, (r, true_dot)
    # and the per-query sims must be the 5 best achievable (dup vectors tie)
    brute = brute_force_topk(df, queries, k=5).collect()
    best = {}
    for r in brute:
        best.setdefault(r["query_id"], set()).add(round(r["sim"], 3))
    for r in rows:
        assert round(r["sim"], 3) in best[r["query_id"]]


def test_pq_refine_recovers_recall(spark, sf_dir):
    from split_kinesis_streams_with_glue_spark.operators.quantize import pq_topk
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        brute_force_topk,
    )
    from split_kinesis_streams_with_glue_spark.plans.registry import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    brute = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id")
    pq = pq_topk(emb, queries, k=10, m=16, ksub=16, n_iters=2, refine=5).select(
        "query_id", "neighbor_id"
    )
    n = brute.count()
    hits = brute.intersect(pq).count()
    assert hits / n >= 0.6  # sf0.001 fixture; contract floor is 0.7 at 0.01


def test_write_clustered_read_pruned_skips_files(spark, tmp_path):
    from split_kinesis_streams_with_glue_spark.operators.layout import (
        read_pruned,
        write_clustered,
    )

    n = 64
    df = spark.createDataFrame(
        [(a, b, a * n + b) for a in range(n) for b in range(n)], ["a", "b", "v"]
    )
    path = str(tmp_path / "zc")
    write_clustered(df, path, "a", "b", num_files=16)
    stats = spark.read.parquet(f"{path}/_stats")
    assert stats.count() == 16
    # box on BOTH dims: few files touched, exact predicate applied inside
    pruned = read_pruned(spark, path, a_range=(8, 15), b_range=(8, 15))
    n_files = pruned.select(F.input_file_name()).distinct().count()
    assert n_files <= 4
    assert pruned.count() == 64  # 8x8 box exactly — no superset rows
    # secondary-dim-only predicate still prunes (the z-order win)
    pruned_b = read_pruned(spark, path, b_range=(0, 7))
    nb = pruned_b.select(F.input_file_name()).distinct().count()
    assert nb < 16
    assert pruned_b.count() == n * 8
    # empty box -> empty frame with the right schema, no files read
    empty = read_pruned(spark, path, a_range=(1000, 2000))
    assert empty.count() == 0
    assert empty.columns == ["a", "b", "v"]


# -------------------------------------------------- weighted PPS / k-anon


def test_weighted_sample_expected_size_and_bias(spark):
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        # ids >= 1000 are 9x heavier
        F.when(F.col("id") >= 1000, 9).otherwise(1).alias("w"),
    )
    kept = weighted_sample(df, "w", expected_n=200, text_col="text")
    rows = kept.collect()
    n = len(rows)
    assert 140 <= n <= 260  # E=200, concentration around it
    heavy = sum(1 for r in rows if r["id"] >= 1000)
    assert heavy / n > 0.75  # heavy rows carry 90% of the weight


def test_weighted_sample_deterministic_under_repartition(spark):
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(500).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text"), F.lit(1).alias("w")
    )
    a = {r["id"] for r in weighted_sample(df, "w", 50).select("id").collect()}
    b = {
        r["id"]
        for r in weighted_sample(df.repartition(13), "w", 50).select("id").collect()
    }
    assert a == b


def test_weighted_sample_certain_inclusion_of_dominant_row(spark):
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("x"), F.col("id")).alias("text"),
        F.when(F.col("id") == 7, 10_000).otherwise(1).alias("w"),
    )
    kept = {r["id"] for r in weighted_sample(df, "w", 5).select("id").collect()}
    assert 7 in kept  # p caps at 1 for w >= W/n


def test_k_anonymity_flags_only_small_groups(spark):
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        k_anonymity,
    )

    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 2 + [("c", "z")], ["g1", "g2"]
    )
    viol = {(r["g1"], r["g2"]): r["n"] for r in k_anonymity(df, ["g1", "g2"], 3).collect()}
    assert viol == {("b", "y"): 2, ("c", "z"): 1}


# ------------------------------------------------------------- maintenance


def test_compact_small_files_rewrites_only_offenders(spark, tmp_path, sf_dir):
    from split_kinesis_streams_with_glue_spark.operators.maintenance import (
        compact_small_files,
        file_census,
    )

    path = str(tmp_path / "t")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # nation 0 fragmented into many small files; others one file each.
    # (AQE would helpfully coalesce the round-robin shuffle back into a
    # few partitions — exactly the fragmentation we need to simulate, so
    # pin it off for the setup writes.)
    seg = "BUILDING"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        frag = cust.filter(F.col("c_mktsegment") == seg).repartition(12)
        rest = cust.filter(F.col("c_mktsegment") != seg).repartition(1)
        frag.write.partitionBy("c_mktsegment").mode("overwrite").parquet(path)
        rest.write.partitionBy("c_mktsegment").mode("append").parquet(path)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    before_rows = spark.read.parquet(path).count()
    census0 = file_census(spark, path)
    assert census0[f"c_mktsegment={seg}"][0] == 12

    report = compact_small_files(spark, path, target_bytes=1 << 30, min_files=8)
    assert [r["partition"] for r in report] == [f"c_mktsegment={seg}"]
    census1 = file_census(spark, path)
    assert census1[f"c_mktsegment={seg}"][0] == 1
    # untouched partitions keep their files; no rows gained or lost
    for part, (n, _) in census1.items():
        if part != f"c_mktsegment={seg}":
            assert n == census0[part][0]
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    # double sums differ by addition order across layouts; compare keysets
    assert sorted(r["c_custkey"] for r in after.select("c_custkey").collect()) == sorted(
        r["c_custkey"] for r in cust.select("c_custkey").collect()
    )
    # idempotent: nothing left to do
    assert compact_small_files(spark, path, target_bytes=1 << 30, min_files=8) == []


def test_vacuum_keeps_current_and_last_n(spark, tmp_path):
    from split_kinesis_streams_with_glue_spark.operators.publish import (
        current_version,
        read_version,
        vacuum_versions,
        write_audit_publish,
    )
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        completeness,
    )

    path = str(tmp_path / "p")
    for n in (3, 5, 7, 9):
        write_audit_publish(
            spark.range(n).selectExpr("id AS k"), path, [completeness("k")]
        )
    removed = vacuum_versions(spark, path, keep_last=2)
    assert removed == [1, 2]
    assert current_version(spark, path) == 4
    assert read_version(spark, path, 3).count() == 7
    assert read_version(spark, path, 4).count() == 9
    with pytest.raises(Exception):
        read_version(spark, path, 1).count()


def test_cms_inner_product_bounds_join_size(spark):
    """Planted multiplicities: |A ⋈ B| = Σ_k cntA(k)·cntB(k) = 3·2 + 1·4
    = 10; the CMS inner product must never undercount and stay within the
    (e/width)·|A|·|B| analytical bound."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 1, "k string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 4 + [("z",)] * 5, "k string")
    est = cms_inner_product(
        cms_build(a, "k", depth=5, width=1024), cms_build(b, "k", depth=5, width=1024)
    ).first()["join_size_estimate"]
    assert est >= 10
    assert est <= 10 + math.e / 1024 * 4 * 11


def test_bloom_prefilter_join_equals_plain_join(spark, sf_dir):
    from split_kinesis_streams_with_glue_spark.operators.sketches import (
        bloom_prefilter_join,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 25 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    got = bloom_prefilter_join(o, dim, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey"
    )
    exp = o.join(dim, o["o_custkey"] == dim["c_custkey"]).select(
        "o_orderkey", "c_custkey"
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    assert got.count() < o.count()  # the prefilter actually drops rows


def test_bloom_empty_member_set_matches_nothing(spark):
    empty = spark.createDataFrame([], "k string")
    bloom = bloom_build(empty, "k", 1 << 12, 4)
    probes = spark.range(50).select(F.concat(F.lit("p"), F.col("id")).alias("k"))
    hits = (
        probes.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("bloom"), F.col("k"), 1 << 12, 4))
        .count()
    )
    assert hits == 0


def test_compact_small_files_skips_null_and_nested_partitions(spark, tmp_path):
    from split_kinesis_streams_with_glue_spark.operators.maintenance import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") % 2).alias("p"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df.repartition(10).write.partitionBy("p").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    before = spark.read.parquet(path).count()
    report = compact_small_files(spark, path, target_bytes=1 << 30, min_files=2)
    # null partition left alone; real partitions compacted; rows intact
    assert all("__HIVE_DEFAULT_PARTITION__" not in r["partition"] for r in report)
    assert {r["partition"] for r in report} <= {"p=0", "p=1"}
    assert spark.read.parquet(path).count() == before


def test_compact_small_files_roundtrips_hive_escaped_values(spark, tmp_path):
    """Partition values holding Hive-escaped chars (':' → %3A, '%' → %25)
    must compact in place: re-attaching the escaped directory string as the
    literal would get re-escaped on write, forking a double-escaped
    duplicate partition and duplicating its rows on read."""
    from split_kinesis_streams_with_glue_spark.operators.maintenance import (
        compact_small_files,
        file_census,
    )

    path = str(tmp_path / "t")
    df = spark.range(90).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("a:b"), F.lit("50%off"), F.lit("plain")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("p"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df.repartition(6).write.partitionBy("p").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    census0 = file_census(spark, path)
    assert set(census0) == {"p=a%3Ab", "p=50%25off", "p=plain"}
    before = spark.read.parquet(path).count()
    report = compact_small_files(spark, path, target_bytes=1 << 30, min_files=2)
    assert {r["partition"] for r in report} == set(census0)
    census1 = file_census(spark, path)
    # no forked double-escaped dirs; every partition down to one file
    assert set(census1) == set(census0)
    assert all(n == 1 for n, _ in census1.values())
    after = spark.read.parquet(path)
    assert after.count() == before
    assert {r["p"] for r in after.select("p").distinct().collect()} == {
        "a:b",
        "50%off",
        "plain",
    }


# ------------------------------------------------------- histogram sketch


def test_histogram_merge_is_per_bin_sum(spark):
    from split_kinesis_streams_with_glue_spark.operators.sketches import (
        value_histogram,
    )

    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        (F.col("id") % 4).alias("g"),
    )
    hist = value_histogram(df, "v", n_bins=32, bucket=F.col("g"))
    merged = hist.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    flat = value_histogram(df, "v", n_bins=32)
    assert sorted((r["bin"], r["cnt"]) for r in merged.collect()) == sorted(
        (r["bin"], r["cnt"]) for r in flat.select("bin", "cnt").collect()
    )


def test_histogram_quantile_error_bounded_by_bin(spark):
    from split_kinesis_streams_with_glue_spark.operators.sketches import (
        histogram_quantile,
        value_histogram,
    )

    df = spark.range(10000).select(F.col("id").cast("double").alias("v"))
    hist = value_histogram(df, "v", n_bins=100)
    for q in (0.1, 0.5, 0.9):
        [r] = histogram_quantile(hist, q).collect()
        assert abs(r["est"] - q * 9999) <= 9999 / 100 + 1, (q, r["est"])
        assert r["n_total"] == 10000


def test_histogram_constant_column_single_bin(spark):
    from split_kinesis_streams_with_glue_spark.operators.sketches import (
        histogram_quantile,
        value_histogram,
    )

    df = spark.range(50).select(F.lit(7.0).alias("v"))
    hist = value_histogram(df, "v", n_bins=16)
    assert hist.count() == 1
    [r] = histogram_quantile(hist, 0.5).collect()
    assert 6.0 <= r["est"] <= 8.0


# ---------------------------------------------------------------- pagerank


def test_pagerank_matches_numpy_power_iteration(spark):
    from split_kinesis_streams_with_glue_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = spark.createDataFrame(edges, ["d1", "d2"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=5).collect()}

    import numpy as np

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    nn = len(nodes)
    adj = np.zeros((nn, nn))
    for a, b in edges:
        adj[idx[a]][idx[b]] = adj[idx[b]][idx[a]] = 1
    out = adj.sum(axis=1)
    r = np.full(nn, 1.0 / nn)
    for _ in range(5):
        r = 0.15 / nn + 0.85 * adj.T @ (r / out)
    for n in nodes:
        assert abs(got[n] - r[idx[n]]) < 1e-9, (n, got[n], r[idx[n]])


def test_pagerank_star_hub_dominates(spark):
    from split_kinesis_streams_with_glue_spark.operators.graph import pagerank

    df = spark.createDataFrame([(0, i) for i in range(1, 8)], ["d1", "d2"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=5).collect()}
    hub = got[0]
    assert all(hub > got[i] for i in range(1, 8))
    assert abs(sum(got.values()) - 1.0) < 1e-6  # conserved mass


def test_compact_with_zorder_tightens_file_boxes(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY form: reclustering during compaction must
    leave each output file with a tighter (a, b) bounding box than the
    fragmented input had."""
    from split_kinesis_streams_with_glue_spark.operators.maintenance import (
        compact_small_files,
    )

    n = 48
    df = spark.createDataFrame(
        [(a, b, "x") for a in range(n) for b in range(n)], ["a", "b", "p"]
    )
    path = str(tmp_path / "zc")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df.repartition(12).write.partitionBy("p").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    def mean_box_area():
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("a") - F.min("a")).alias("da"),
                (F.max("b") - F.min("b")).alias("db"),
            )
            .collect()
        )
        return sum((r["da"] + 1) * (r["db"] + 1) for r in stats) / len(stats)

    before = mean_box_area()  # round-robin: every file spans ~the whole grid
    report = compact_small_files(
        spark, path, target_bytes=4_000, min_files=4, zorder_cols=("a", "b")
    )
    assert report and report[0]["files_after"] >= 2  # multi-file, z-ranged
    after = mean_box_area()
    assert after < before / 2, (before, after)
    assert spark.read.parquet(path).count() == n * n


def test_zvalue_3d_known_interleave(spark):
    from split_kinesis_streams_with_glue_spark.operators.layout import (
        spread_bits_3d,
        zvalue_3d,
    )

    df = spark.range(1).select(
        spread_bits_3d(F.lit(0b1011)).alias("s"),
        zvalue_3d(F.lit(1), F.lit(1), F.lit(1)).alias("z111"),
        zvalue_3d(F.lit(1023), F.lit(1023), F.lit(1023)).alias("zmax"),
        zvalue_3d(F.lit(0), F.lit(0), F.lit(1)).alias("zc"),
    )
    [r] = df.collect()
    # 0b1011 -> set bits 0,1,3 land at positions 0,3,9 = 1+8+512
    assert r["s"] == 521
    assert r["z111"] == 0b111
    assert r["zmax"] == (1 << 30) - 1
    assert r["zc"] == 0b100


def test_cluster_safe_split_no_cluster_straddles_splits(spark, sf_dir):
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        jaccard_pairs,
        shingle_sets,
    )
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        cluster_safe_split,
    )
    from split_kinesis_streams_with_glue_spark.plans.registry import load

    d = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingle_sets(d), 0.5).select("d1", "d2")
    out = cluster_safe_split(d.select("doc_id"), pairs)
    # the leakage invariant: one split per cluster
    straddle = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0
    # and specifically every near-dup PAIR agrees
    s1 = out.select(F.col("doc_id").alias("d1"), F.col("split").alias("sp1"))
    s2 = out.select(F.col("doc_id").alias("d2"), F.col("split").alias("sp2"))
    disagree = (
        pairs.join(s1, "d1").join(s2, "d2").filter(F.col("sp1") != F.col("sp2")).count()
    )
    assert disagree == 0
    # still roughly 80/10/10 over clusters
    frac = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert frac.get("train", 0) > frac.get("val", 0)
    assert frac.get("train", 0) > frac.get("test", 0)


def test_exact_quantile_twopass_edges(spark, sf_dir):
    """Two-pass exact quantile agrees with a full sort at extreme q, under
    heavy skew (99% of mass on one value), and on a constant column."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        exact_quantile_twopass,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(5000)
    vals = sorted(r["l_extendedprice"] for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for q in (0.25, 0.75, 0.999):
        k = max(1, -(-int(q * n) // 1) if (q * n) == int(q * n) else int(q * n) + 1)
        got = exact_quantile_twopass(
            li, "l_extendedprice", q, rank_limit=100
        ).collect()[0]["value"]
        assert got == vals[k - 1], f"q={q}: {got} != {vals[k-1]}"

    skewed = li.withColumn(
        "v",
        F.when(F.col("l_orderkey") % 100 != 0, F.lit(7.0)).otherwise(
            F.col("l_extendedprice")
        ),
    )
    sv = sorted(r["v"] for r in skewed.select("v").collect())
    k = int(0.5 * len(sv)) + (0 if (0.5 * len(sv)).is_integer() else 1)
    got = exact_quantile_twopass(skewed, "v", 0.5, rank_limit=100).collect()[0]["value"]
    assert got == sv[max(1, k) - 1]

    const = li.withColumn("c", F.lit(42.0))
    assert exact_quantile_twopass(const, "c", 0.5).collect()[0]["value"] == 42.0


def test_benford_first_digit_exact(spark):
    """Digit extraction is string-exact: sub-1 magnitudes are excluded,
    signs ignored, and boundary powers of ten bin correctly (the float
    log10 failure mode the operator exists to avoid)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        benford_first_digit,
    )

    vals = [(1.5,), (19.2,), (950.0,), (0.4,), (-23.0,), (1000.0,), (999.999,)]
    df = spark.createDataFrame(vals, "x double")
    rows = {r["digit"]: r for r in benford_first_digit(df, "x").collect()}
    # 1.5->1, 19.2->1, 950->9, 0.4 excluded, -23->2, 1000.0->1, 999.999->9
    assert {d: rows[d]["n"] for d in rows} == {1: 3, 2: 1, 9: 2}
    assert abs(rows[1]["obs_frac"] - 0.5) < 1e-9
    assert abs(rows[1]["exp_frac"] - 0.30103) < 1e-5


def test_autocorrelation_matches_definition(spark):
    """ACF of a period-2 series equals the closed-form sample ACF (negative
    at lag 1, positive at lag 2, magnitudes from the boundary-loss
    formula)."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        autocorrelation,
    )

    xs = [10.0, 20.0] * 6  # 12 days alternating
    days = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(days, "day date, x double")
    got = {r["lag"]: r["acf"] for r in autocorrelation(df, "day", "x", max_lag=3).collect()}
    mu = sum(xs) / len(xs)
    den = sum((x - mu) ** 2 for x in xs)

    def acf(k):
        return sum(
            (xs[i] - mu) * (xs[i + k] - mu) for i in range(len(xs) - k)
        ) / den

    for k in (1, 2, 3):
        assert abs(got[k] - round(acf(k), 6)) < 1e-6
    assert got[1] < 0 < got[2]


def test_theil_sen_ignores_outlier(spark):
    """A clean slope-2 line with one wild spike: OLS would move, the
    median-of-slopes does not."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        theil_sen_slope,
    )

    pts = [(float(t), 2.0 * t) for t in range(12)]
    pts[5] = (5.0, 1000.0)  # outlier day
    df = spark.createDataFrame(pts, "t double, x double")
    got = theil_sen_slope(df, "t", "x").collect()[0]
    assert got["n_pairs"] == 12 * 11 // 2
    assert abs(got["slope"] - 2.0) < 1e-9


def test_stl_decompose_reconstructs_and_centers(spark):
    """trend + seasonal + residual == x on every day (reconstruction
    identity), and a pure weekly square wave puts (almost) everything in
    the seasonal component once the trend window spans whole periods."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        stl_decompose,
    )

    # 4 whole weeks: weekday pattern [0,0,0,0,0,70,70] repeated
    xs = ([10.0] * 5 + [80.0] * 2) * 4
    days = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), x) for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(days, "day date, x double")
    rows = stl_decompose(df, "day", "x").collect()
    # edge days (partial trend window) have NULL trend and residual
    for r in rows:
        if r["day"] < dt.date(2024, 1, 4) or r["day"] > dt.date(2024, 1, 25):
            assert r["trend"] is None and r["residual"] is None
        else:
            assert abs(r["x"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-5
    # interior days (full trend window): trend = weekly mean, and the
    # seasonal component absorbs the square wave exactly (residual 0)
    interior = [r for r in rows if dt.date(2024, 1, 4) <= r["day"] <= dt.date(2024, 1, 25)]
    assert interior
    weekly_mean = (10.0 * 5 + 80.0 * 2) / 7
    for r in interior:
        assert abs(r["trend"] - weekly_mean) < 1e-6
        assert abs(r["residual"]) < 1e-6


def test_l_diversity_flags_low_diversity_groups(spark):
    """k-anonymous but not l-diverse: the 3-row group sharing one
    sensitive value is flagged; the diverse group is not."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        l_diversity,
    )

    rows = [
        ("g1", "flu"), ("g1", "flu"), ("g1", "flu"),       # 3 rows, 1 value
        ("g2", "flu"), ("g2", "cold"), ("g2", "covid"),    # diverse
    ]
    df = spark.createDataFrame(rows, "quasi string, diag string")
    got = l_diversity(df, ["quasi"], "diag", l=2).collect()
    assert len(got) == 1
    assert got[0]["quasi"] == "g1" and got[0]["n"] == 3 and got[0]["n_sensitive"] == 1


def test_poisson_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    """The 95% CI must bracket the point sum on well-behaved data, weights
    must reproduce run-to-run (hash-derived), and the replicate count must
    equal B."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        poisson_bootstrap_ci,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1.0).alias("v")
    )
    a = poisson_bootstrap_ci(df, "k", "v", b_reps=80).collect()[0]
    b = poisson_bootstrap_ci(df, "k", "v", b_reps=80).collect()[0]
    assert a == b  # deterministic
    assert a["n_reps"] == 80
    assert a["ci_lo"] < a["point_sum"] < a["ci_hi"]
    # CI width should be a few percent of the total, not degenerate
    assert 0 < (a["ci_hi"] - a["ci_lo"]) < a["point_sum"]


def test_neyman_allocation_prefers_volatile_strata(spark):
    """Two equal-size strata, one constant (sigma 0) and one volatile: the
    whole budget goes to the volatile stratum; allocations sum to the
    budget."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = [("flat", 100.0)] * 50 + [("wild", float(100 + 50 * (i % 7))) for i in range(50)]
    df = spark.createDataFrame(rows, "stratum string, v double")
    got = {r["stratum"]: r for r in neyman_allocation(df, "stratum", "v", 200).collect()}
    assert got["flat"]["sigma"] == 0.0 and got["flat"]["allocation"] == 0.0
    assert abs(got["wild"]["allocation"] - 200.0) < 1e-6
    assert got["flat"]["n_rows"] == got["wild"]["n_rows"] == 50


def test_chi2_independence_known_table(spark):
    """2x2 contingency with a hand-computed X^2: [[30,10],[10,30]] ->
    X^2 = 20, dof = 1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        chi2_independence,
    )

    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "u string, v string")
    got = chi2_independence(df, "u", "v").collect()[0]
    assert got["dof"] == 1 and got["n_cells"] == 4
    assert abs(got["chi2"] - 20.0) < 1e-6


def test_ks_binned_identical_and_shifted(spark):
    """Identical distributions -> D = 0; a hard shift -> D = 1 (the CDFs
    never overlap inside the grid)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        ks_binned,
    )

    same = spark.createDataFrame(
        [(float(i % 50), i % 2 == 0) for i in range(200)], "x double, a boolean"
    )
    got = ks_binned(same, "x", F.col("a"), lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert got["ks_d"] == 0.0 and got["n_a"] == got["n_b"] == 100

    shifted = spark.createDataFrame(
        [(float(i % 40), True) for i in range(100)]
        + [(60.0 + float(i % 40), False) for i in range(100)],
        "x double, a boolean",
    )
    got = ks_binned(shifted, "x", F.col("a"), lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert got["ks_d"] == 1.0


def test_chi2_constant_column_is_zero_with_zero_dof(spark):
    """A constant second column: dof = 0 and X^2 = 0 (observed ==
    expected everywhere) — the degenerate case must not divide by a zero
    expected count."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "x")] * 7, "u string, v string"
    )
    got = chi2_independence(df, "u", "v").collect()[0]
    assert got["dof"] == 0 and got["chi2"] == 0.0


def test_ks_binned_one_empty_side_yields_null(spark):
    """With no rows on one side the statistic is undefined — the operator
    must surface NULL, never a fabricated 0 or a crash."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        ks_binned,
    )

    df = spark.createDataFrame(
        [(float(i), True) for i in range(20)], "x double, a boolean"
    )
    got = ks_binned(df, "x", F.col("a"), lo=0.0, hi=100.0, n_bins=10).collect()[0]
    assert got["ks_d"] is None and got["n_b"] == 0


def test_neyman_single_stratum_gets_whole_budget(spark):
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        neyman_allocation,
    )

    df = spark.createDataFrame(
        [("only", float(i % 13)) for i in range(40)], "s string, v double"
    )
    got = neyman_allocation(df, "s", "v", 500).collect()
    assert len(got) == 1
    assert abs(got[0]["allocation"] - 500.0) < 1e-6


def test_cluster_safe_kfold_near_copies_share_a_fold(spark):
    """Round-6 verdict #2: ``kfold_assign`` pins only EXACT duplicates —
    near-copies (different bytes, Jaccard ~0.95) hash independently and
    CAN straddle folds. This plants such a pair (chosen so the content
    hashes demonstrably land in different folds), shows the hole, and
    asserts ``cluster_safe_kfold`` closes it: the near-dup edge welds the
    pair into one cluster and the cluster-id fold is shared by
    construction."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        jaccard_pairs,
        shingle_sets,
    )
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        cluster_safe_kfold,
        kfold_assign,
    )

    words = ["tok%d" % i for i in range(80)]
    base = " ".join(words)
    near = " ".join(words[:-1] + ["alpha"])  # one word differs: J ~ 0.95
    rows = [(1, base), (2, near), (3, "an unrelated little document here")]
    d = spark.createDataFrame(rows, "doc_id int, text string")

    pairs = jaccard_pairs(shingle_sets(d), 0.9).select("d1", "d2")
    assert [(r["d1"], r["d2"]) for r in pairs.collect()] == [(1, 2)]

    # the hole: content-hash folds differ for the planted near-copies
    naive = {r["doc_id"]: r["fold"] for r in kfold_assign(d).collect()}
    assert naive[1] != naive[2]

    # the fix: cluster-keyed folds agree for every cluster member
    safe = cluster_safe_kfold(d, pairs)
    got = {r["doc_id"]: r for r in safe.collect()}
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == 1
    assert got[1]["fold"] == got[2]["fold"]
    assert all(0 <= r["fold"] < 5 for r in got.values())
    # invariant form: no cluster straddles folds
    straddle = (
        safe.groupBy("cluster_id")
        .agg(F.count_distinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert straddle == 0


def test_chi2_independence_builds_lazily_in_one_plan(spark):
    """Round-6 verdict #3: dof used to come from two extra
    ``df.select(col).distinct().count()`` actions — two additional
    full-corpus scans fired eagerly at BUILD time. The dof now folds
    from the bounded contingency frame inside the single aggregate, so
    constructing the result DataFrame must launch no Spark job at all,
    and the values (including dof) are unchanged."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        chi2_independence,
    )

    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"), ("z", "p")]
    df = spark.createDataFrame(rows, "a string, b string")
    spark.sparkContext.setJobGroup("chi2-build", "lazy-build check")
    out = chi2_independence(df, "a", "b")
    built_jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
        "chi2-build"
    )
    spark.sparkContext.setJobGroup("chi2-collect", "")
    assert list(built_jobs) == [], "building chi2_independence ran Spark jobs"
    row = out.collect()[0]
    assert row["dof"] == 2  # (3-1)*(2-1)
    assert row["n_cells"] == 5


def test_priority_sample_exact_k_weighted_and_partition_invariant(spark):
    """Priority sampling (DLT): exactly k rows, matches the brute-force
    Python computation of the same md5-derived priorities, certainly
    includes a row whose weight dwarfs the rest, and is invariant to
    physical partitioning."""
    import hashlib

    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, "doc %d body" % i, 100 + i) for i in range(40)]
    rows.append((99, "the whale", 10**9))  # w >> everything else
    df = spark.createDataFrame(rows, "doc_id int, text string, w long")

    def prio(text, w):
        u48 = int(hashlib.md5(text.encode()).hexdigest()[:12], 16)
        return w * float(1 << 48) / (u48 + 1)

    expect = sorted(rows, key=lambda r: (-prio(r[1], r[2]), r[1]))[:10]
    got = priority_sample(df, k=10, weight_col="w").collect()
    assert len(got) == 10
    assert {r["doc_id"] for r in got} == {r[0] for r in expect}
    assert 99 in {r["doc_id"] for r in got}
    got8 = priority_sample(df.repartition(8), k=10, weight_col="w").collect()
    assert {r["doc_id"] for r in got8} == {r[0] for r in expect}


def test_key_skew_profile_hand_computed(spark):
    """10 rows over 4 keys, hottest holds 6: mean 2.5, skew ratio 2.4,
    salt factor ceil(2.4) = 3; top-10 covers everything."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        key_skew_profile,
    )

    rows = [("hot",)] * 6 + [("a",), ("b",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    [r] = key_skew_profile(df, "k", top=10).collect()
    assert r["n_rows"] == 10 and r["n_keys"] == 4 and r["max_per_key"] == 6
    assert abs(r["mean_per_key"] - 2.5) < 1e-9
    assert abs(r["skew_ratio"] - 2.4) < 1e-9
    assert r["top10_share"] == 1.0
    assert r["salt_factor"] == 3
    # top-2 hot-set mass: 6 + 2 of 10
    [r2] = key_skew_profile(df, "k", top=2).collect()
    assert abs(r2["top10_share"] - 0.8) < 1e-9


def test_linkage_feature_weights_hand_computed(spark):
    """Fellegi-Sunter weights on a 5-record, 3-pair fixture covering the
    edges: null<=>null agreement counts as agreement, u = 0 (all-distinct
    feature) nulls the agreement weight, u = 1 (constant feature) nulls
    the disagreement weight. Hand computation:
    x: hist {a:2, b:1, null:2} -> u = 4/20 = 0.2; pairs agree 2/3 ->
       m = (2*2+1)/(2*4) = 0.625; w+ = log2(0.625/0.2) = 1.643856,
       w- = log2(0.375/0.8) = -1.093109.
    y (all distinct): u = 0, m = 1/8 -> w+ NULL, w- = log2(0.875).
    z (constant):     u = 1, m = 7/8 -> w+ = log2(0.875), w- NULL."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.linkage import (
        linkage_feature_weights,
    )

    rec = spark.createDataFrame(
        [
            (1, "a", "p", "k"),
            (2, "a", "q", "k"),
            (3, "b", "r", "k"),
            (4, None, "s", "k"),
            (5, None, "t", "k"),
        ],
        "doc_id int, x string, y string, z string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5), (3, 4)], "d1 int, d2 int"
    )
    got = {
        r["feature"]: r
        for r in linkage_feature_weights(rec, pairs, ["x", "y", "z"]).collect()
    }
    x = got["x"]
    assert x["n_pairs"] == 3
    assert abs(x["m_prob"] - 0.625) < 1e-9 and abs(x["u_prob"] - 0.2) < 1e-9
    assert abs(x["weight_agree"] - round(math.log2(3.125), 6)) < 1e-9
    assert abs(x["weight_disagree"] - round(math.log2(0.375 / 0.8), 6)) < 1e-9
    y = got["y"]
    assert y["u_prob"] == 0.0 and y["weight_agree"] is None
    assert abs(y["weight_disagree"] - round(math.log2(0.875), 6)) < 1e-9
    z = got["z"]
    assert z["u_prob"] == 1.0 and z["weight_disagree"] is None
    assert abs(z["weight_agree"] - round(math.log2(0.875), 6)) < 1e-9


# ---------------------------------------------------------------------------
# round-8 operators: hand-computed verifications
# ---------------------------------------------------------------------------


def test_average_precision_hand_computed(spark):
    """Ranking by score desc: [rel, non, rel, non] -> AP = (1/2) *
    (1/1 + 2/3) = 0.833333; P@2 = 1/2. A perfect ranking scores 1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.8, 0), (3, 0.7, 1), (4, 0.6, 0)],
        "id int, score double, rel int",
    )
    [r] = average_precision(df, "score", "rel", "id", k=2).collect()
    assert r["n"] == 4 and r["n_rel"] == 2
    assert abs(r["average_precision"] - (1.0 + 2.0 / 3.0) / 2.0) < 1e-6
    assert abs(r["p_at_k"] - 0.5) < 1e-9
    perfect = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.8, 1), (3, 0.7, 0)], "id int, score double, rel int"
    )
    [p] = average_precision(perfect, "score", "rel", "id", k=2).collect()
    assert p["average_precision"] == 1.0 and p["p_at_k"] == 1.0


def test_wasserstein_1d_hand_computed(spark):
    """a = {0, 0}, b = {1, 1}: ECDFs differ by 1 on [0,1) -> W1 = 1.
    a = {0, 2}, b = {1, 3}: |Fa-Fb| = 0.5 on [0,1) and [2,3) but 0 on
    [1,2) (both at 0.5) -> W1 = 1.0 (each point shifts by 1).
    Identical distributions -> 0."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        wasserstein_1d,
    )

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 1), ("b", 1)], "g string, v int"
    )
    [r] = wasserstein_1d(df, "v", "g", "a", "b").collect()
    assert r["n_a"] == 2 and r["n_b"] == 2 and r["n_support"] == 2
    assert abs(r["w1_distance"] - 1.0) < 1e-9

    df2 = spark.createDataFrame(
        [("a", 0), ("a", 2), ("b", 1), ("b", 3)], "g string, v int"
    )
    [r2] = wasserstein_1d(df2, "v", "g", "a", "b").collect()
    assert abs(r2["w1_distance"] - 1.0) < 1e-9

    same = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 5), ("b", 7)], "g string, v int"
    )
    [r3] = wasserstein_1d(same, "v", "g", "a", "b").collect()
    assert r3["w1_distance"] == 0.0


def test_eb_beta_binomial_hand_computed(spark):
    """Three groups with rates 0.2, 0.5, 0.8 (n=10 each): m = 0.5,
    v = var_pop = 0.06 -> s = 0.25*0.24/0.06... wait: m(1-m)/v - 1 =
    0.25/0.06 - 1 = 3.166667; alpha = beta = 1.583333. Group a shrinks
    toward 0.5: (2 + 1.583333)/(10 + 3.166667) = 0.272152. Degenerate
    (identical rates, v=0) -> NULL shrunk rates."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        eb_beta_binomial,
    )

    rows = (
        [("a", 1)] * 2 + [("a", 0)] * 8
        + [("b", 1)] * 5 + [("b", 0)] * 5
        + [("c", 1)] * 8 + [("c", 0)] * 2
    )
    df = spark.createDataFrame(rows, "g string, f int")
    got = {r["group"]: r for r in eb_beta_binomial(df, "g", "f").collect()}
    s = 0.5 * 0.5 / 0.06 - 1.0
    assert abs(got["a"]["prior_alpha"] - round(0.5 * s, 6)) < 1e-9
    assert abs(got["a"]["shrunk_rate"] - round((2 + 0.5 * s) / (10 + s), 6)) < 1e-6
    assert abs(got["c"]["shrunk_rate"] - round((8 + 0.5 * s) / (10 + s), 6)) < 1e-6
    # shrinkage pulls extremes toward the middle
    assert got["a"]["shrunk_rate"] > got["a"]["raw_rate"]
    assert got["c"]["shrunk_rate"] < got["c"]["raw_rate"]
    flat = spark.createDataFrame(
        [("a", 1), ("a", 0), ("b", 1), ("b", 0)], "g string, f int"
    )
    for r in eb_beta_binomial(flat, "g", "f").collect():
        assert r["shrunk_rate"] is None and r["raw_rate"] == 0.5


def test_welch_ttest_hand_computed(spark):
    """a = {1,2,3} (mean 2, var 1), b = {2,4,6} (mean 4, var 4):
    t = (2-4)/sqrt(1/3+4/3) = -2/sqrt(5/3) = -1.549193;
    df = (5/3)^2 / ((1/9)/2 + (16/9)/2) = 2.941176. Identical groups
    -> t = 0, p = 1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        welch_ttest,
    )
    import math

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 4), ("b", 6)],
        "g string, v int",
    )
    [r] = welch_ttest(df, "v", "g", "a", "b").collect()
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["mean_a"] == 2.0 and r["mean_b"] == 4.0
    assert abs(r["t_stat"] - round(-2 / math.sqrt(5.0 / 3.0), 6)) < 1e-6
    se = 1.0 / 3.0 + 4.0 / 3.0
    dfw = se * se / ((1.0 / 9.0) / 2.0 + (16.0 / 9.0) / 2.0)
    assert abs(r["welch_df"] - round(dfw, 6)) < 1e-6
    assert 0 < r["p_value"] < 0.2
    same = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 3)], "g string, v int"
    )
    [s] = welch_ttest(same, "v", "g", "a", "b").collect()
    assert s["t_stat"] == 0.0 and abs(s["p_value"] - 1.0) < 1e-4


def test_mmd_linear_hand_computed(spark):
    """Identical paired populations: every quad has k(x1,x2) = k(y1,y2)
    and the cross terms equal them too -> h = 0 -> MMD^2 = 0. Disjoint
    clusters (x around the origin, y far away): cross kernels ~ 0,
    within kernels ~ 1 -> MMD^2 near 2."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        mmd_linear,
    )

    same = spark.createDataFrame(
        [
            ("x", 1, [1.0, 0.0]), ("x", 2, [0.0, 1.0]),
            ("y", 3, [1.0, 0.0]), ("y", 4, [0.0, 1.0]),
        ],
        "g string, vec_id int, embedding array<float>",
    )
    [r] = mmd_linear(same, "g", "x", "y").collect()
    assert r["n_pairs"] == 1 and abs(r["mmd2_linear"]) < 1e-9

    far = spark.createDataFrame(
        [
            ("x", 1, [0.0, 0.0]), ("x", 2, [0.1, 0.0]),
            ("y", 3, [100.0, 0.0]), ("y", 4, [100.1, 0.0]),
        ],
        "g string, vec_id int, embedding array<float>",
    )
    [f] = mmd_linear(far, "g", "x", "y").collect()
    assert f["mmd2_linear"] > 1.9
    # odd tails drop: 3 x-rows pair once
    odd = spark.createDataFrame(
        [
            ("x", 1, [0.0]), ("x", 2, [0.0]), ("x", 5, [9.0]),
            ("y", 3, [0.0]), ("y", 4, [0.0]),
        ],
        "g string, vec_id int, embedding array<float>",
    )
    [o] = mmd_linear(odd, "g", "x", "y").collect()
    assert o["n_pairs"] == 1


def test_silhouette_simplified_hand_computed(spark):
    """Two tight, well-separated clusters: own-centroid distance 1,
    other-centroid distance sqrt(101) -> s = (sqrt(101)-1)/sqrt(101)
    = 0.900504 for every point."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        silhouette_simplified,
    )
    import math

    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0], 0), (2, [0.0, -1.0], 0),
            (3, [10.0, 1.0], 1), (4, [10.0, -1.0], 1),
        ],
        "vec_id int, embedding array<float>, label int",
    )
    got = {r["label"]: r for r in silhouette_simplified(df).collect()}
    expect = (math.sqrt(101.0) - 1.0) / math.sqrt(101.0)
    for lbl in (0, 1):
        assert got[lbl]["n"] == 2
        assert abs(got[lbl]["mean_silhouette"] - round(expect, 6)) < 1e-6


def test_horvitz_thompson_unbiasedness_shape(spark):
    """With uniform weights and c = 1 every pi = 1, u < 1 always ->
    the 'sample' is the census, ht_total == true_total exactly and the
    variance term (1-pi) vanishes."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        horvitz_thompson_total,
    )

    df = spark.createDataFrame(
        [(f"doc {i}", 10) for i in range(20)], "text string, y int"
    )
    [r] = horvitz_thompson_total(
        df, "y", "y", sampling_fraction_num=1, sampling_fraction_den=1
    ).collect()
    assert r["n_population"] == 20 and r["n_sampled"] == 20
    assert r["ht_total"] == r["true_total"] == 200.0
    assert r["ht_variance"] == 0.0
    # a thinner design samples fewer rows but reweights toward the total
    [t] = horvitz_thompson_total(
        df, "y", "y", sampling_fraction_num=1, sampling_fraction_den=2
    ).collect()
    assert 0 < t["n_sampled"] < 20
    assert t["ht_total"] == round(t["n_sampled"] * 10 / 0.5, 6)


def test_token_budget_fill_hand_computed(spark):
    """Groups (quality, tokens): a(0.9, 100), b(0.5, 100), c(0.1, 100);
    budget 150 -> a whole, b half (fraction 0.5), c excluded."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        token_budget_fill,
    )

    rows = (
        [("a", 50, 0.9)] * 2 + [("b", 50, 0.5)] * 2 + [("c", 50, 0.1)] * 2
    )
    df = spark.createDataFrame(rows, "g string, tok int, q double")
    got = {r["group"]: r for r in token_budget_fill(df, "g", "tok", "q", 150).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["take_tokens"] == 100 and got["a"]["take_fraction"] == 1.0
    assert got["b"]["take_tokens"] == 50 and got["b"]["take_fraction"] == 0.5
    assert got["b"]["cum_before"] == 100
    # budget >= total admits everything whole
    full = token_budget_fill(df, "g", "tok", "q", 1000).collect()
    assert all(r["take_fraction"] == 1.0 for r in full)


def test_hill_tail_index_hand_computed(spark):
    """Counts 8, 4, 2 with k = 2: x_3 = 2, gamma = (ln 4 + ln 2)/2 =
    1.5*ln 2 = 1.039721, alpha = 0.961797. A flat head (all counts
    equal x_{k+1}) -> gamma 0, alpha NULL."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        hill_tail_index,
    )
    import math

    df = spark.createDataFrame(
        [("a a a a a a a a b b b b c c",)], "text string"
    )
    [r] = hill_tail_index(df, k=2).collect()
    assert r["k"] == 2 and r["x_tail"] == 2
    assert abs(r["hill_gamma"] - round(1.5 * math.log(2.0), 6)) < 1e-9
    assert abs(r["hill_alpha"] - round(1.0 / (1.5 * math.log(2.0)), 6)) < 1e-6
    flat = spark.createDataFrame([("a a b b c c",)], "text string")
    [f] = hill_tail_index(flat, k=2).collect()
    assert f["hill_gamma"] == 0.0 and f["hill_alpha"] is None
    # vocabulary of <= k terms: no (k+1)-th order statistic
    tiny = hill_tail_index(
        spark.createDataFrame([("a b",)], "text string"), k=2
    ).collect()
    assert len(tiny) == 1 and tiny[0]["x_tail"] is None


def test_segmental_ttr_hand_computed(spark):
    """Doc 1: 4 tokens 'a b a b' with segment_len 2 -> two full
    segments with TTR 1.0 each... no: segments are ['a b'] TTR 1,
    ['a b'] TTR 1 -> MSTTR 1. Doc 2: 'c c c c' -> two segments TTR 0.5
    each. MSTTR over 4 segments = 0.75; the 5-token doc's trailing
    single token is discarded."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        segmental_ttr,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c c c c"), (3, "d e d e x")],
        "doc_id int, text string",
    )
    [r] = segmental_ttr(df, segment_len=2).collect()
    # doc3 contributes two full segments ('d e', 'd e') TTR 1; tail 'x' dropped
    assert r["n_docs"] == 3 and r["n_segments"] == 6
    assert abs(r["msttr"] - (1 + 1 + 0.5 + 0.5 + 1 + 1) / 6.0) < 1e-6
    # raw TTR: tokens a b a b c c c c d e d e x -> 6 distinct / 13
    assert abs(r["raw_ttr"] - round(6.0 / 13.0, 6)) < 1e-9


def test_sorted_neighborhood_hand_computed(spark):
    """Keys sort as k1 < k2 < k3 < k4; window 2 pairs each row with its
    next two neighbors: (1,2),(1,3),(2,3),(2,4),(3,4) — 2n-3 pairs.
    The two-pass range rank must reproduce the single-sort ranking
    regardless of partition count."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "k1"), (2, "k2"), (3, "k3"), (4, "k4")], "doc_id int, key string"
    )
    got = sorted_neighborhood_pairs(df, F.col("key"), window=2).collect()
    pairs = sorted((r["id_a"], r["id_b"], r["offset"]) for r in got)
    assert pairs == [(1, 2, 1), (1, 3, 2), (2, 3, 1), (2, 4, 2), (3, 4, 1)]
    # key ties break by id; partition-count invariance
    tied = spark.createDataFrame(
        [(i, "same") for i in range(1, 7)], "doc_id int, key string"
    )
    for nparts in (1, 3, 8):
        got2 = sorted_neighborhood_pairs(
            tied, F.col("key"), window=1, n_partitions=nparts
        ).collect()
        assert sorted((r["id_a"], r["id_b"]) for r in got2) == [
            (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)
        ]


def test_changepoint_mean_hand_computed(spark):
    """Series 0,0,0,10,10,10: split after t=2 gives means 0 vs 10,
    gain = 3*3/6*100 = 150 — the argmax, localized exactly. A constant
    series reports zero gain."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        changepoint_mean,
    )

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 10), (4, 10), (5, 10)], "t int, x int"
    )
    [r] = changepoint_mean(df, "t", "x").collect()
    assert r["split_t"] == 2
    assert r["n_left"] == 3 and r["n_right"] == 3
    assert r["mean_left"] == 0.0 and r["mean_right"] == 10.0
    assert abs(r["sse_gain"] - 150.0) < 1e-9
    flat = spark.createDataFrame([(t, 5) for t in range(6)], "t int, x int")
    [f] = changepoint_mean(flat, "t", "x").collect()
    assert f["sse_gain"] == 0.0 and f["split_t"] == 0


def test_ndcg_hand_computed(spark):
    """Ranking [rel 0, rel 2, rel 1] by score desc, k = 3:
    DCG = 0/log2(2) + 3/log2(3) + 1/log2(4) = 3/1.584963 + 0.5 =
    2.392789; ideal order rel 2,1,0 -> IDCG = 3/1 + 1/1.584963 =
    3.630930; nDCG = 0.659002. A relevance-sorted ranking scores 1;
    all-zero relevance -> NULL."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        ndcg_at_k,
    )

    df = spark.createDataFrame(
        [(1, 0.9, 0), (2, 0.8, 2), (3, 0.7, 1)], "id int, score double, rel int"
    )
    [r] = ndcg_at_k(df, "rel", "score", "id", k=3).collect()
    dcg = 3.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    idcg = 3.0 + 1.0 / math.log2(3.0)
    assert abs(r["dcg"] - round(dcg, 6)) < 1e-6
    assert abs(r["idcg"] - round(idcg, 6)) < 1e-6
    assert abs(r["ndcg"] - round(dcg / idcg, 6)) < 1e-4
    ideal = spark.createDataFrame(
        [(1, 0.9, 2), (2, 0.8, 1), (3, 0.7, 0)], "id int, score double, rel int"
    )
    [p] = ndcg_at_k(ideal, "rel", "score", "id", k=3).collect()
    assert p["ndcg"] == 1.0
    zero = spark.createDataFrame(
        [(1, 0.9, 0), (2, 0.8, 0)], "id int, score double, rel int"
    )
    [z] = ndcg_at_k(zero, "rel", "score", "id", k=3).collect()
    assert z["ndcg"] is None and z["dcg"] == 0.0


def test_mantel_haenszel_hand_computed(spark):
    """Classic Simpson setup with two strata. Stratum s1: a=8 b=2 c=4
    d=1 (n=15); stratum s2: a=1 b=4 c=2 d=8 (n=15). Per-stratum OR =
    (8*1)/(2*4) = 1 and (1*8)/(4*2) = 1 -> OR_MH = (8/15 + 8/15) /
    (8/15 + 8/15) = 1. Crude table: a=9 b=6 c=6 d=9 -> crude OR =
    81/36 = 2.25 — the confounding gap the operator exists to show."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        mantel_haenszel_or,
    )

    rows = (
        [("s1", 1, 1)] * 8 + [("s1", 1, 0)] * 2
        + [("s1", 0, 1)] * 4 + [("s1", 0, 0)] * 1
        + [("s2", 1, 1)] * 1 + [("s2", 1, 0)] * 4
        + [("s2", 0, 1)] * 2 + [("s2", 0, 0)] * 8
    )
    df = spark.createDataFrame(rows, "s string, e int, o int")
    [r] = mantel_haenszel_or(df, "s", "e", "o").collect()
    assert r["n_strata"] == 2
    assert abs(r["or_mh"] - 1.0) < 1e-9
    assert abs(r["or_crude"] - 2.25) < 1e-9
    # zero-denominator strata family -> NULL rather than infinity
    degen = spark.createDataFrame(
        [("s", 1, 1), ("s", 0, 0)], "s string, e int, o int"
    )
    [d] = mantel_haenszel_or(degen, "s", "e", "o").collect()
    assert d["or_mh"] is None and d["or_crude"] is None


def test_blocking_metrics_hand_computed(spark):
    """Candidates {(1,2),(3,4)}, truth {(2,1),(5,6)} over n=6 rows:
    hit = 1 (orientation-normalized), PC = 1/2, RR = 1 - 2/15."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        blocking_metrics,
    )

    cand = spark.createDataFrame([(1, 2), (3, 4)], "id_a int, id_b int")
    truth = spark.createDataFrame([(2, 1), (5, 6)], "d1 int, d2 int")
    [r] = blocking_metrics(cand, truth, 6).collect()
    assert r["n_candidates"] == 2 and r["n_true"] == 2 and r["n_hit"] == 1
    assert abs(r["pair_completeness"] - 0.5) < 1e-9
    assert abs(r["reduction_ratio"] - round(1.0 - 2.0 / 15.0, 6)) < 1e-9
    # no true matches: PC undefined (NULL), RR still reported
    [z] = blocking_metrics(
        cand, truth.filter("d1 > 100"), 6
    ).collect()
    assert z["pair_completeness"] is None and z["n_true"] == 0


def test_blocking_metrics_deduplicates_both_orientations(spark):
    """Round-9 advice: a candidate frame carrying BOTH orientations of a
    pair (or band-level LSH duplicates) must count the pair ONCE — PC
    and RR are set metrics, and join multiplicity used to let
    pair_completeness exceed 1.0."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        blocking_metrics,
    )

    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 4)], "id_a int, id_b int"
    )
    truth = spark.createDataFrame([(2, 1), (2, 1)], "d1 int, d2 int")
    [r] = blocking_metrics(cand, truth, 6).collect()
    assert r["n_candidates"] == 2  # {(1,2),(3,4)} after normalization
    assert r["n_true"] == 1
    assert r["n_hit"] == 1
    assert r["pair_completeness"] == 1.0  # never > 1.0


def test_wasserstein_1d_absent_group_is_null(spark):
    """Round-9 advice: W1 against an empty sample is undefined — NULL,
    not the 0.0 the coalesce used to emit (and not the NaN raw IEEE SQL
    division would emit)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        wasserstein_1d,
    )

    df = spark.createDataFrame([("a", 0), ("a", 2)], "g string, v int")
    [r] = wasserstein_1d(df, "v", "g", "a", "b").collect()
    assert r["n_a"] == 2 and r["n_b"] == 0
    assert r["w1_distance"] is None


def test_welch_ttest_degenerate_groups_are_null(spark):
    """Round-9 advice: n < 2 has no sample variance and two constant
    groups have no t — t/df/p are NULL (Spark's Divide would NULL where
    DuckDB's IEEE division NaN/infs; both sides now branch explicitly).
    Means stay defined for n >= 1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        welch_ttest,
    )

    one = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "g string, v int"
    )
    [r] = welch_ttest(one, "v", "g", "a", "b").collect()
    assert r["n_b"] == 1 and r["mean_b"] == 5.0
    assert r["t_stat"] is None and r["welch_df"] is None
    assert r["p_value"] is None

    const = spark.createDataFrame(
        [("a", 3), ("a", 3), ("b", 3), ("b", 3)], "g string, v int"
    )
    [c] = welch_ttest(const, "v", "g", "a", "b").collect()
    assert c["t_stat"] is None and c["p_value"] is None


def test_silhouette_simplified_degenerate_inputs(spark):
    """Round-9 advice: an empty frame raises a clear ValueError from the
    dimension probe (not TypeError on None); a single-cluster input
    returns an empty frame (no nearest OTHER centroid exists)."""
    import pytest

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        silhouette_simplified,
    )

    empty = spark.createDataFrame(
        [], "vec_id int, label int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dimension"):
        silhouette_simplified(empty)

    single = spark.createDataFrame(
        [(1, 0, [0.0, 1.0]), (2, 0, [1.0, 0.0])],
        "vec_id int, label int, embedding array<double>",
    )
    assert silhouette_simplified(single).count() == 0


def test_segmental_ttr_short_docs_keep_raw_ttr(spark):
    """Round-9 advice (the oracle-divergence class): a corpus with
    tokens but ZERO full segments still reports the real corpus TTR —
    only msttr is undefined. 'a b c' + 'a a' at segment_len 25: nt = 5,
    dt = 3 -> raw_ttr = 0.6, n_segments = 0, msttr NULL."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        segmental_ttr,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a a")], "doc_id int, text string"
    )
    [r] = segmental_ttr(df, segment_len=25).collect()
    assert r["n_docs"] == 0 and r["n_segments"] == 0
    assert r["msttr"] is None
    assert abs(r["raw_ttr"] - 0.6) < 1e-9


def test_sttr_oracle_parity_on_short_doc_corpus(spark):
    """Round-9 advice (medium): the registry oracle for
    ``text_sttr_diversity`` must agree with the operator on a corpus
    with tokens but zero full 25-token segments — the old
    ``FROM per_seg, overall WHERE n = 25`` cross join emptied and
    NULLed raw_ttr where the operator's crossJoin(broadcast(overall))
    emits the real dt/nt."""
    import duckdb

    from split_kinesis_streams_with_glue_spark.operators.text import (
        segmental_ttr,
    )
    from split_kinesis_streams_with_glue_spark.plans import all_queries
    from tests.oracle_harness import compare

    oracle = all_queries()["text_sttr_diversity"].oracle
    rows = [(1, "a b c"), (2, "a a")]
    sdf = segmental_ttr(
        spark.createDataFrame(rows, "doc_id int, text string"),
        segment_len=25,
    )
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        compare(sdf, con, oracle, "text_sttr_diversity@short-docs")
    finally:
        con.close()


def test_auc_rank_hand_computed(spark):
    """Scores: pos {3, 2}, neg {1, 2}. Ascending mid-ranks: 1 -> 1,
    the tied 2s -> 2.5 each, 3 -> 4. R_pos = 2.5 + 4 = 6.5, U = 6.5 -
    2*3/2 = 3.5, AUC = 3.5 / (2*2) = 0.875; u_times2 = 2*6.5 - 6 = 7.
    One-class input -> NULL auc."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        auc_rank,
    )

    df = spark.createDataFrame(
        [(3, 1), (2, 1), (1, 0), (2, 0)], "s int, y int"
    )
    [r] = auc_rank(df, "s", "y").collect()
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    # u_times2 is an exact digit string (int64-unbounded, round-11)
    assert r["u_times2"] == "7"
    assert abs(r["auc"] - 0.875) < 1e-9
    [d] = auc_rank(df.filter("y = 1"), "s", "y").collect()
    assert d["auc"] is None and d["n_neg"] == 0


def test_auc_rank_separable_is_one(spark):
    """Perfectly separated scores -> AUC exactly 1.0 (and 0.0 reversed)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        auc_rank,
    )

    df = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "s int, y int"
    )
    [r] = auc_rank(df, "s", "y").collect()
    assert r["auc"] == 1.0
    rev = spark.createDataFrame(
        [(10, 0), (9, 0), (2, 1), (1, 1)], "s int, y int"
    )
    [v] = auc_rank(rev, "s", "y").collect()
    assert v["auc"] == 0.0


def test_cramers_v_hand_computed(spark):
    """Perfect 2x2 association (5 (a,x) + 5 (b,y)): chi2 = n = 10,
    V = 1; Bergsma-corrected: phi2c = 1 - 1/9, kc = 17/9 - 1 = 8/9 ->
    V_corr = 1. Independent 2x2 (balanced): chi2 = 0 -> V = 0.
    Single-category column -> NULL Vs."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cramers_v,
    )

    perfect = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5, "u string, w string"
    )
    [p] = cramers_v(perfect, "u", "w").collect()
    assert p["n"] == 10 and p["df_r"] == 2 and p["df_c"] == 2
    assert abs(p["chi2"] - 10.0) < 1e-9
    assert abs(p["v"] - 1.0) < 1e-9
    assert abs(p["v_corrected"] - 1.0) < 1e-9
    indep = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5
        + [("b", "x")] * 5 + [("b", "y")] * 5,
        "u string, w string",
    )
    [i] = cramers_v(indep, "u", "w").collect()
    assert i["chi2"] == 0.0 and i["v"] == 0.0 and i["v_corrected"] == 0.0
    degen = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "u string, w string"
    )
    [d] = cramers_v(degen, "u", "w").collect()
    assert d["v"] is None and d["v_corrected"] is None


def test_conformal_coverage_mirrors_sequential(spark):
    """The operator must equal the literal split-conformal procedure run
    in plain Python over the same md5 split: k = ceil(0.9*(n_cal+1)),
    threshold = k-th smallest calibration score, coverage = share of
    eval scores <= threshold."""
    import hashlib
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        conformal_coverage,
    )

    rows = [(f"t{i:03d}", "g", 1000 + 7 * i) for i in range(40)]
    df = spark.createDataFrame(rows, "text string, grp string, sc int")
    [r] = conformal_coverage(df, "sc", "grp").collect()

    cal = [(t, s) for t, g, s in rows
           if hashlib.md5(t.encode()).hexdigest()[:4] < "8000"]
    ev = [(t, s) for t, g, s in rows
          if hashlib.md5(t.encode()).hexdigest()[:4] >= "8000"]
    k = math.ceil(0.9 * (len(cal) + 1))
    thr = sorted(s for _, s in cal)[k - 1]
    cov = sum(1 for _, s in ev if s <= thr) / len(ev)
    assert r["n_calib"] == len(cal) and r["n_eval"] == len(ev)
    assert r["k"] == k and r["threshold"] == thr
    assert abs(r["coverage"] - round(cov, 6)) < 1e-9


def test_conformal_coverage_alpha_too_small_is_null(spark):
    """alpha = 1/100 with a tiny calibration set: k = ceil(0.99*(n+1))
    exceeds n -> threshold/coverage NULL (the honest answer, not a
    clamped max)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        conformal_coverage,
    )

    rows = [(f"t{i:03d}", "g", i) for i in range(8)]
    df = spark.createDataFrame(rows, "text string, grp string, sc int")
    [r] = conformal_coverage(
        df, "sc", "grp", alpha_num=1, alpha_den=100
    ).collect()
    assert r["threshold"] is None and r["coverage"] is None
    assert r["k"] is None  # no calibration row carries the k-th rank


def test_kneser_ney_hand_computed(spark):
    """Corpus ['a b a b', 'a c']: bigram types (a,b):2, (b,a):1,
    (a,c):1, T = 3; c(a) = 3, N1+(a,.) = 2; c(b) = 1, N1+(b,.) = 1;
    N1+(.,b) = N1+(.,a) = N1+(.,c) = 1.
    P(b|a) = 1.25/3 + (1.5/3)*(1/3) = 0.583333;
    P(a|b) = 0.25 + 0.75*(1/3) = 0.5;
    P(c|a) = 0.25/3 + (1.5/3)*(1/3) = 0.25."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        kneser_ney_bigram,
    )

    df = spark.createDataFrame([("a b a b",), ("a c",)], "text string")
    rows = kneser_ney_bigram(df, k=10).collect()
    got = {(r["w1"], r["w2"]): (r["c12"], r["pkn"]) for r in rows}
    assert got[("a", "b")] == (2, 0.583333)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("a", "c")] == (1, 0.25)
    # ranked by pkn desc
    assert [(r["w1"], r["w2"]) for r in rows] == [
        ("a", "b"), ("b", "a"), ("a", "c")
    ]
    # single-token and empty docs contribute no bigrams
    degen = spark.createDataFrame([("solo",), ("",)], "text string")
    assert kneser_ney_bigram(degen, k=5).count() == 0


def test_pareto_skyline_hand_computed(spark):
    """Points (1,.9) x2, (2,.5), (2,.7), (3,.7), (3,.3): the frontier is
    {(3,.7), (1,.9), (1,.9)} — (2,.7) is dominated by (3,.7) (greater x,
    equal y), and equal-point duplicates of a frontier point all
    survive."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        pareto_skyline,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.9), (2, 0.5), (2, 0.7), (3, 0.7), (3, 0.3)],
        "x int, y double",
    )
    got = sorted((r["x"], r["y"]) for r in pareto_skyline(df, "x", "y").collect())
    assert got == [(1, 0.9), (1, 0.9), (3, 0.7)]


def test_pareto_skyline_mirrors_naive(spark):
    """The prefix-max formulation must equal the literal quadratic
    dominance definition on a deterministic grid with ties."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        pareto_skyline,
    )

    pts = [((i * 7) % 5, ((i * 13) % 11) / 10.0) for i in range(60)]
    df = spark.createDataFrame(pts, "x int, y double")
    got = sorted((r["x"], r["y"]) for r in pareto_skyline(df, "x", "y").collect())
    naive = sorted(
        a
        for a in pts
        if not any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in pts
        )
    )
    assert got == naive


def test_quantile_normalize_hand_computed(spark):
    """Groups g1 = [10, 20, 30], g2 = [100, 200]; global sorted
    [10, 20, 30, 100, 200] (N = 5). g1 maps ranks 1,2,3 -> global
    indices 1,3,5 -> 10, 30, 200; g2 maps ranks 1,2 -> indices 1,5 ->
    10, 200."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        quantile_normalize,
    )

    rows = [(1, "g1", 10), (2, "g1", 20), (3, "g1", 30),
            (4, "g2", 100), (5, "g2", 200)]
    df = spark.createDataFrame(rows, "doc_id int, src string, v int")
    got = {
        r["doc_id"]: r["norm_v"]
        for r in quantile_normalize(df, "v", "src").collect()
    }
    assert got == {1: 10, 2: 30, 3: 200, 4: 10, 5: 200}


def test_quantile_normalize_singleton_group_maps_to_median(spark):
    """A single-row group has no quantile position: it maps to the
    global median index (N+1) div 2."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        quantile_normalize,
    )

    rows = [(1, "g1", 1), (2, "g1", 2), (3, "g2", 7)]
    df = spark.createDataFrame(rows, "doc_id int, src string, v int")
    got = {
        r["doc_id"]: r["norm_v"]
        for r in quantile_normalize(df, "v", "src").collect()
    }
    # global sorted [1, 2, 7], N = 3; g1 -> indices 1, 3; g2 -> (3+1)//2 = 2
    assert got == {1: 1, 2: 7, 3: 2}


def test_lightweight_coreset_mirrors_sequential(spark):
    """The operator must equal the literal Bachem-Lucic-Krause procedure
    run in plain Python over the same deterministic md5 priorities."""
    import hashlib

    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        lightweight_coreset,
    )

    vecs = [
        (i, [float((i * 3 + j * 5) % 7) for j in range(4)])
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    m = 3
    got = lightweight_coreset(df, m=m).collect()

    n = len(vecs)
    mean = [
        sum(round(v[j], 6) for _, v in vecs) / n for j in range(4)
    ]
    d2 = {
        i: round(sum((x - mu) ** 2 for x, mu in zip(v, mean)), 6)
        for i, v in vecs
    }
    sd2 = sum(d2.values())
    q = {
        i: (0.5 / n + (0.5 * d2[i]) / sd2) if sd2 > 0 else 1.0 / n
        for i, _ in vecs
    }

    def prio(i):
        u48 = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        return q[i] * float(1 << 48) / (u48 + 1)

    expect = sorted(vecs, key=lambda t: (-prio(t[0]), t[0]))[:m]
    assert [r["vec_id"] for r in got] == [i for i, _ in expect]
    for r in got:
        assert abs(r["dist2"] - d2[r["vec_id"]]) < 1e-6
        assert abs(r["q_prob"] - round(q[r["vec_id"]], 6)) < 1e-6
        assert abs(r["weight"] - round(1.0 / (m * q[r["vec_id"]]), 6)) < 1e-6


def test_lightweight_coreset_identical_points_uniform(spark):
    """All-identical vectors: sd2 = 0 -> uniform q = 1/n, weight n/m."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        lightweight_coreset,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(1, 7)],
        "vec_id long, embedding array<float>",
    )
    got = lightweight_coreset(df, m=2).collect()
    assert len(got) == 2
    for r in got:
        assert r["dist2"] == 0.0
        assert abs(r["q_prob"] - round(1.0 / 6.0, 6)) < 1e-9
        assert abs(r["weight"] - 3.0) < 1e-9


def test_sliced_wasserstein_identical_groups_zero(spark):
    """Identical label-0 and label-1 clouds -> every slice distance 0;
    a missing group -> NULL distances (the family convention)."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        sliced_wasserstein,
    )

    base = [[float((i * 7 + j) % 5) for j in range(8)] for i in range(6)]
    rows = [(v, 0) for v in base] + [(v, 1) for v in base]
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    got = sliced_wasserstein(df, "label", 0, 1, n_slices=3, dim=8).collect()
    assert [r["slice_id"] for r in got] == [0, 1, 2]
    for r in got:
        assert r["n_a"] == 6 and r["n_b"] == 6
        assert r["w1_distance"] == 0.0
    only_a = df.filter("label = 0")
    for r in sliced_wasserstein(only_a, "label", 0, 1, n_slices=2, dim=8).collect():
        assert r["w1_distance"] is None and r["n_b"] == 0


def test_sliced_wasserstein_shift_is_mean_shift(spark):
    """Shifting a 1-slice projection by a constant c shifts W1 by |c|
    when the sign pattern is all-positive on the moved coordinate:
    group b = group a with +2.0 on coordinate 0 only -> per-slice W1 =
    2 * |sign_0| * scale exactly (distributions are translates)."""
    from split_kinesis_streams_with_glue_spark.operators.quantize import (
        projection_signs,
    )
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        sliced_wasserstein,
    )

    base = [[float((i * 3) % 4), 1.0] for i in range(5)]
    shifted = [[v[0] + 2.0, v[1]] for v in base]
    rows = [(v, 0) for v in base] + [(v, 1) for v in shifted]
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    got = sliced_wasserstein(df, "label", 0, 1, n_slices=2, dim=2).collect()
    signs = projection_signs(2, 2)
    scale = 1.0 / (2 ** 0.5)
    for r in got:
        expect = abs(2.0 * signs[r["slice_id"]][0] * scale)
        assert abs(r["w1_distance"] - expect) < 1e-5


def _naive_ipf(cells, n_iters=4):
    """Literal integer-state IPF mirror: cells = {(r, c): n}."""
    rows = sorted({r for r, _ in cells})
    cols = sorted({c for _, c in cells})
    tot = sum(cells.values())
    row_t9 = tot * 1e9 / len(rows)
    col_t = {c: sum(n for (r, cc), n in cells.items() if cc == c) for c in cols}
    w9 = {k: 1000000000 for k in cells}
    for _ in range(n_iters):
        for r in rows:
            rs9 = float(sum(w9[k] * n for k, n in cells.items() if k[0] == r))
            for k in cells:
                if k[0] == r:
                    w9[k] = int(round(w9[k] * (row_t9 / rs9)))
        for c in cols:
            cs9 = float(sum(w9[k] * n for k, n in cells.items() if k[1] == c))
            for k in cells:
                if k[1] == c:
                    w9[k] = int(round(w9[k] * ((col_t[c] * 1e9) / cs9)))
    import math

    return {k: math.floor((v + 500) / 1000.0) / 1e6 for k, v in w9.items()}


def test_raking_ipf_mirrors_sequential(spark):
    """The operator must equal the literal integer-state IPF loop, and
    the converged weighted marginals must sit at their targets: row
    shares equalized, column totals preserved."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        raking_ipf,
    )

    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "x")] * 2
        + [("b", "y")] * 6 + [("c", "x")] * 1 + [("c", "y")] * 3
    )
    df = spark.createDataFrame(rows, "r string, c string")
    got = {
        (x["r"], x["c"]): (x["n"], x["weight"])
        for x in raking_ipf(df, "r", "c").collect()
    }
    from collections import Counter

    cells = Counter(rows)
    want = _naive_ipf(dict(cells))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == cells[k]
        assert abs(got[k][1] - want[k]) < 1e-9
    # converged marginals: rows ~ total/3 each, cols ~ observed totals
    tot = len(rows)
    for r in "abc":
        share = sum(got[k][0] * got[k][1] for k in got if k[0] == r)
        assert abs(share - tot / 3.0) < 0.05
    for c in "xy":
        share = sum(got[k][0] * got[k][1] for k in got if k[1] == c)
        obs = sum(1 for _, cc in rows if cc == c)
        assert abs(share - obs) < 0.05


def test_brier_decomposition_hand_computed(spark):
    """Perfectly calibrated forecasts {0.8: 4/5 pos, 0.2: 1/5 pos}:
    reliability = 0, uncertainty = 0.25, resolution = 2*5*0.09/10 =
    0.09, Brier = 0.16 — equal to the direct mean (p-y)^2."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        brier_decomposition,
    )

    rows = (
        [(0.8, 1)] * 4 + [(0.8, 0)] + [(0.2, 1)] + [(0.2, 0)] * 4
    )
    df = spark.createDataFrame(rows, "p double, y int")
    [r] = brier_decomposition(df, "p", "y").collect()
    assert r["n"] == 10 and r["n_groups"] == 2
    assert abs(r["reliability"] - 0.0) < 1e-9
    assert abs(r["uncertainty"] - 0.25) < 1e-9
    assert abs(r["resolution"] - 0.09) < 1e-9
    assert abs(r["brier"] - 0.16) < 1e-9


def test_adjusted_rand_index_hand_computed(spark):
    """A = {1,2 | 3,4}, B = {1 | 2,3,4}: contingency (x,x)=1, (x,y)=1,
    (y,y)=2 -> index = 1, ea = 2, eb = 3, E = 2*3/6 = 1, max = 2.5,
    ARI = (1-1)/(2.5-1) = 0 (chance-level agreement). Identical
    labelings -> 1; all-singletons on both sides -> NULL (undefined)."""
    from split_kinesis_streams_with_glue_spark.operators.graph import (
        adjusted_rand_index,
    )

    a = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], "doc_id int, cluster_id string"
    )
    b = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "y"), (4, "y")], "doc_id int, cluster_id string"
    )
    [r] = adjusted_rand_index(a, b).collect()
    assert r["n"] == 4 and r["n_clusters_a"] == 2 and r["n_clusters_b"] == 2
    assert r["index_pairs"] == 1.0 and r["expected_pairs"] == 1.0
    assert r["max_pairs"] == 2.5 and r["ari"] == 0.0
    [ident] = adjusted_rand_index(a, a).collect()
    assert ident["ari"] == 1.0
    singl = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id int, cluster_id string"
    )
    [s] = adjusted_rand_index(singl, singl).collect()
    assert s["ari"] is None


def test_brown_forsythe_hand_computed(spark):
    """Groups a=[1,2,3,4,10] (median 3, z=[2,1,0,1,7]) and b=[5]*5
    (z all 0): SSB = 5*(2.2-1.1)^2 + 5*(0-1.1)^2 = 12.1, SSW = 30.8,
    F = (12.1/1)/(30.8/8) = 3.142857."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        brown_forsythe,
    )

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 10.0)] + [
        ("b", 5.0)
    ] * 5
    df = spark.createDataFrame(rows, "g string, x double")
    [r] = brown_forsythe(df, "x", "g").collect()
    assert r["n"] == 10 and r["n_groups"] == 2
    assert abs(r["ss_between"] - 12.1) < 1e-9
    assert abs(r["ss_within"] - 30.8) < 1e-9
    assert abs(r["f_stat"] - 3.142857) < 1e-6


def test_brown_forsythe_degenerate_is_null(spark):
    """One group, or zero within-group spread everywhere, yields a NULL
    F (the statistic is undefined), never a divide-by-zero."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        brown_forsythe,
    )

    one = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0)], "g string, x double"
    )
    [r] = brown_forsythe(one, "x", "g").collect()
    assert r["f_stat"] is None
    flat = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 7.0), ("b", 7.0)],
        "g string, x double",
    )
    [r2] = brown_forsythe(flat, "x", "g").collect()
    assert r2["f_stat"] is None and r2["ss_within"] == 0.0


def test_theil_u_independent_and_dependent(spark):
    """A perfectly independent 2x2 gives MI=0 and both U=0; a perfectly
    dependent one gives MI=ln 2 and both U=1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        theil_u,
    )

    indep = spark.createDataFrame(
        [("a", "p")] * 2 + [("a", "q")] * 2 + [("b", "p")] * 2 + [("b", "q")] * 2,
        "x string, y string",
    )
    [r] = theil_u(indep, "x", "y").collect()
    assert r["n"] == 8 and r["n_x_values"] == 2 and r["n_y_values"] == 2
    assert r["mutual_info"] == 0.0
    assert r["u_x_given_y"] == 0.0 and r["u_y_given_x"] == 0.0
    dep = spark.createDataFrame(
        [("a", "p")] * 2 + [("b", "q")] * 2, "x string, y string"
    )
    [d] = theil_u(dep, "x", "y").collect()
    assert abs(d["h_x"] - 0.693147) < 1e-6
    assert d["u_x_given_y"] == 1.0 and d["u_y_given_x"] == 1.0


def test_theil_u_constant_variable_is_null(spark):
    """A constant X has H(X)=0: U(X|Y) is undefined (NULL), while
    U(Y|X) is 0 (X carries no information about Y)."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        theil_u,
    )

    df = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("a", "p"), ("a", "q")], "x string, y string"
    )
    [r] = theil_u(df, "x", "y").collect()
    assert r["h_x"] == 0.0 and r["u_x_given_y"] is None
    assert r["u_y_given_x"] == 0.0


def test_cochran_armitage_hand_computed(spark):
    """Levels s=0,1,2 with n=4 each and r=1,2,3: N=12 R=6 S1=12 S2=20
    T=8 -> num=2, svar=8, var=2, z=sqrt(2)=1.414214, chi2=2."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cochran_armitage,
    )

    rows = (
        [(0, 1)] + [(0, 0)] * 3
        + [(1, 1)] * 2 + [(1, 0)] * 2
        + [(2, 1)] * 3 + [(2, 0)]
    )
    df = spark.createDataFrame(rows, "s int, y int")
    [r] = cochran_armitage(df, "s", "y").collect()
    assert r["n"] == 12 and r["n_pos"] == 6 and r["n_levels"] == 3
    assert abs(r["z_trend"] - 1.414214) < 1e-6
    assert abs(r["chi2_trend"] - 2.0) < 1e-9


def test_cochran_armitage_degenerate_is_null(spark):
    """All-positive labels (R=N) or a single level (score variance 0)
    leave the statistic undefined -> NULL z and chi2."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cochran_armitage,
    )

    allpos = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1)], "s int, y int"
    )
    [r] = cochran_armitage(allpos, "s", "y").collect()
    assert r["z_trend"] is None and r["chi2_trend"] is None
    onelevel = spark.createDataFrame(
        [(3, 1), (3, 0), (3, 1)], "s int, y int"
    )
    [r2] = cochran_armitage(onelevel, "s", "y").collect()
    assert r2["z_trend"] is None


def test_yule_k_hand_computed(spark):
    """Tokens 'a a a b b c': spectrum V1=V2=V3=1, N=6, sum m^2 Vm = 14,
    K = 1e4*(14-6)/36 = 2222.222222."""
    from split_kinesis_streams_with_glue_spark.operators.text import yule_k

    df = spark.createDataFrame(
        [(1, "a a a b b c", "en")], "doc_id long, text string, lang string"
    )
    [r] = yule_k(df, "text", "lang").collect()
    assert r["lang"] == "en" and r["n_tokens"] == 6 and r["n_types"] == 3
    assert abs(r["yule_k"] - 2222.222222) < 1e-5


def test_yule_k_matches_naive_spectrum(spark):
    """K from the operator equals the literal Counter-of-Counters form
    on a multi-group corpus; token-free groups are absent."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.text import yule_k

    rows = [
        (1, "x y x y x", "en"),
        (2, "x z", "en"),
        (3, "q q q q", "de"),
        (4, "", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in yule_k(df, "text", "lang").collect()}
    assert set(got) == {"en", "de"}  # fr had zero tokens
    for lang in ("en", "de"):
        toks = [
            t
            for _, tx, lg in rows
            if lg == lang
            for t in tx.lower().split()
            if t
        ]
        tf = Counter(toks)
        spec = Counter(tf.values())
        n = sum(m * v for m, v in spec.items())
        s2 = sum(m * m * v for m, v in spec.items())
        want = 1e4 * (s2 - n) / (n * n)
        assert got[lang]["n_tokens"] == n
        assert got[lang]["n_types"] == len(tf)
        assert abs(got[lang]["yule_k"] - want) < 1e-5


def test_heaps_law_hand_computed(spark):
    """Docs id 0:'a b', id 1:'a c' bucket to b=0 and b=16: checkpoints
    (N,V) = (2,2),(4,3) -> beta = ln(3/2)/ln 2 = 0.584963, K = 4/3
    (the exact line through both points)."""
    from split_kinesis_streams_with_glue_spark.operators.text import heaps_law

    df = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], "doc_id long, text string"
    )
    [r] = heaps_law(df, "text", "doc_id").collect()
    assert r["n_points"] == 2 and r["n_tokens"] == 4 and r["n_types"] == 3
    assert abs(r["beta"] - 0.584963) < 1e-5
    assert abs(r["heaps_k"] - 4.0 / 3.0) < 1e-5


def test_heaps_law_single_point_is_null(spark):
    """One doc -> one checkpoint -> OLS denominator 0 -> NULL fit (the
    totals still report)."""
    from split_kinesis_streams_with_glue_spark.operators.text import heaps_law

    df = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    [r] = heaps_law(df, "text", "doc_id").collect()
    assert r["n_points"] == 1 and r["n_tokens"] == 3 and r["n_types"] == 2
    assert r["beta"] is None and r["heaps_k"] is None


def test_calinski_harabasz_hand_computed(spark):
    """1-D clusters x=[0,2] (centroid 1) and y=[4,6] (centroid 5),
    global mean 3: B = 2*4+2*4 = 16, W = 4, CH = (16/1)/(4/2) = 8."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        calinski_harabasz,
    )

    df = spark.createDataFrame(
        [("x", [0.0]), ("x", [2.0]), ("y", [4.0]), ("y", [6.0])],
        "label string, embedding array<float>",
    )
    [r] = calinski_harabasz(df, "embedding", "label").collect()
    assert r["n"] == 4 and r["n_clusters"] == 2 and r["n_dims"] == 1
    assert abs(r["ss_between"] - 16.0) < 1e-6
    assert abs(r["ss_within"] - 4.0) < 1e-6
    assert abs(r["ch_index"] - 8.0) < 1e-6


def test_calinski_harabasz_degenerate_is_null(spark):
    """Single cluster (k=1) and zero within-dispersion are undefined ->
    NULL index."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        calinski_harabasz,
    )

    one = spark.createDataFrame(
        [("x", [1.0, 2.0]), ("x", [3.0, 4.0])],
        "label string, embedding array<float>",
    )
    [r] = calinski_harabasz(one, "embedding", "label").collect()
    assert r["ch_index"] is None
    exact = spark.createDataFrame(
        [("x", [1.0]), ("x", [1.0]), ("y", [5.0]), ("y", [5.0])],
        "label string, embedding array<float>",
    )
    [r2] = calinski_harabasz(exact, "embedding", "label").collect()
    assert r2["ss_within"] == 0.0 and r2["ch_index"] is None


def test_cross_correlation_hand_computed(spark):
    """x=[1,2,3], y=[3,1,2] at lag 0: n=3 sxy=11 -> r = -3/6 = -0.5; a
    shifted linear copy correlates 1.0 exactly at its shift lag."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        cross_correlation,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0, 1, 3),
        (d0 + dt.timedelta(days=1), 2, 1),
        (d0 + dt.timedelta(days=2), 3, 2),
    ]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    got = {
        r["lag"]: r for r in cross_correlation(df, "day", "x", "y", 1).collect()
    }
    assert got[0]["n_days"] == 3
    assert abs(got[0]["ccf"] + 0.5) < 1e-9
    # y_{t+1} = x_t exactly: lag +1 pairs (1,1),(2,2) -> r = 1
    rows2 = [
        (d0, 1, 9),
        (d0 + dt.timedelta(days=1), 2, 1),
        (d0 + dt.timedelta(days=2), 5, 2),
    ]
    df2 = spark.createDataFrame(rows2, "day date, x long, y long")
    got2 = {
        r["lag"]: r
        for r in cross_correlation(df2, "day", "x", "y", 1).collect()
    }
    assert got2[1]["n_days"] == 2 and abs(got2[1]["ccf"] - 1.0) < 1e-9


def test_cross_correlation_constant_side_is_null(spark):
    """A constant series has zero variance: ccf undefined -> NULL."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        cross_correlation,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), 5, i + 1) for i in range(4)]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    for r in cross_correlation(df, "day", "x", "y", 2).collect():
        assert r["ccf"] is None


def test_haar_energy_hand_computed(spark):
    """v=[4,2,6,0]: level 1 details (2, 6) -> E=(4+36)/2=20; level 2
    detail 4+2-6-0=0 -> E=0; levels 3,4: block sum 12 as the (padded)
    first half -> E = 144/8 = 18 and 144/16 = 9."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        haar_energy,
    )

    d0 = dt.date(2024, 3, 1)
    rows = [(d0 + dt.timedelta(days=i), v) for i, v in enumerate([4, 2, 6, 0])]
    df = spark.createDataFrame(rows, "day date, x long")
    got = {r["level"]: r for r in haar_energy(df, "day", "x", 4).collect()}
    assert got[1]["n_blocks"] == 2 and abs(got[1]["energy"] - 20.0) < 1e-9
    assert got[2]["n_blocks"] == 1 and got[2]["energy"] == 0.0
    assert abs(got[3]["energy"] - 18.0) < 1e-9
    assert abs(got[4]["energy"] - 9.0) < 1e-9


def test_haar_energy_gap_days_count_as_zero(spark):
    """A missing calendar day is a 0 in the dyadic series: v=[4,_,6,0]
    at level 1 gives details (4-0, 6-0) -> E = (16+36)/2 = 26."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        haar_energy,
    )

    d0 = dt.date(2024, 3, 1)
    rows = [
        (d0, 4),
        (d0 + dt.timedelta(days=2), 6),
        (d0 + dt.timedelta(days=3), 0),
    ]
    df = spark.createDataFrame(rows, "day date, x long")
    got = {r["level"]: r for r in haar_energy(df, "day", "x", 1).collect()}
    assert abs(got[1]["energy"] - 26.0) < 1e-9


def test_systematic_sample_exact_spread(spark):
    """N=5, m=2 keeps exactly ranks 3 and 5 (the fractional-interval
    rule), and m=N keeps everything."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        systematic_sample,
    )

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 6)], "doc_id long, score long"
    )
    got = sorted(
        r["doc_id"] for r in systematic_sample(df, 2, "score", "doc_id").collect()
    )
    assert got == [3, 5]
    assert (
        systematic_sample(df, 5, "score", "doc_id").count() == 5
    )


def test_systematic_sample_exact_m_at_scale_of_ties(spark):
    """Heavy ties in the first order column still yield exactly m rows
    (doc_id tiebreak makes the order total)."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        systematic_sample,
    )

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(97)], "doc_id long, score long"
    )
    assert systematic_sample(df, 10, "score", "doc_id").count() == 10


def test_phash_buckets_matches_naive_md5(spark):
    """Bucket stats equal the literal per-band Counter over hashlib md5
    of the decoded signature; ids 1539/3075 share (w,h,nb) and must
    collide in EVERY band."""
    import hashlib
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.multimodal import (
        attach_fake_images,
        phash_buckets,
    )

    ids = [1539, 3075, 7, 320]
    df = attach_fake_images(
        spark.createDataFrame([(i,) for i in ids], "doc_id long")
    )
    got = {r["band"]: r for r in phash_buckets(df).collect()}
    sigs = [
        f"{i % 512 + 16}:{i % 384 + 16}:3:{9 + 7 + len(str(i))}" for i in ids
    ]
    fps = [hashlib.md5(s.encode()).hexdigest() for s in sigs]
    for band in range(4):
        cnt = Counter(f[band * 2 : band * 2 + 2] for f in fps)
        pairs = sum(c * (c - 1) // 2 for c in cnt.values())
        assert got[band]["n_buckets"] == len(cnt)
        assert got[band]["n_candidate_pairs"] == pairs
        assert got[band]["max_bucket"] == max(cnt.values())
        assert pairs >= 1  # the planted twin collides in every band


def test_haar_energy_whole_block_gap_counts_zero_blocks(spark):
    """Post-review fix: an interior gap covering WHOLE blocks still
    counts them (all-zero, energy 0) — days {0,8} at level 1 span 5
    dyadic blocks, not the 2 that contain data."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        haar_energy,
    )

    d0 = dt.date(2024, 3, 1)
    df = spark.createDataFrame(
        [(d0, 4), (d0 + dt.timedelta(days=8), 6)], "day date, x long"
    )
    got = {r["level"]: r for r in haar_energy(df, "day", "x", 1).collect()}
    assert got[1]["n_blocks"] == 5
    assert abs(got[1]["energy"] - (16 / 2 + 36 / 2)) < 1e-9


def test_cross_correlation_null_side_rows_excluded(spark):
    """Post-review fix: a full-outer-joined caller frame carries NULL x
    or y on non-overlap days — those rows must not inflate n_days
    (pairwise-complete semantics)."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        cross_correlation,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0, 1, 3),
        (d0 + dt.timedelta(days=1), 2, None),
        (d0 + dt.timedelta(days=2), 3, 2),
        (d0 + dt.timedelta(days=3), None, 5),
    ]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    got = {
        r["lag"]: r
        for r in cross_correlation(df, "day", "x", "y", 1).collect()
    }
    # lag 0 pairs: days 0 and 2 only (day 1 has NULL y, day 3 NULL x)
    assert got[0]["n_days"] == 2
    assert abs(got[0]["ccf"] + 1.0) < 1e-9  # (1,3),(3,2): perfect inverse


def test_phash_buckets_rejects_band_overrun(spark):
    """Post-review fix: banding past the 32-char md5 digest would bucket
    empty substrings (quadratic garbage) — rejected up front."""
    import pytest

    from split_kinesis_streams_with_glue_spark.operators.multimodal import (
        attach_fake_images,
        phash_buckets,
    )

    df = attach_fake_images(
        spark.createDataFrame([(1,)], "doc_id long")
    )
    with pytest.raises(ValueError, match="32 hex"):
        phash_buckets(df, n_bands=20, band_hex=2)
    # round-10 ADVICE: non-positive values passed the upper-bound guard
    # and silently produced a bogus band -1 (sequence(0,-1) descends)
    with pytest.raises(ValueError, match=">= 1"):
        phash_buckets(df, n_bands=0, band_hex=2)
    with pytest.raises(ValueError, match=">= 1"):
        phash_buckets(df, n_bands=4, band_hex=-1)


def test_systematic_sample_rejects_bad_m(spark):
    """Round-10 ADVICE: m is interpolated into a SQL expression — m <= 0
    silently returned an empty frame and a non-int malformed the
    expression at analysis time; both now raise up front."""
    import pytest

    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        systematic_sample,
    )

    df = spark.createDataFrame([(1, 1)], "doc_id long, score long")
    for bad in (0, -3, 2.5, "4", True):
        with pytest.raises(ValueError, match="positive int"):
            systematic_sample(df, bad, "score", "doc_id")
