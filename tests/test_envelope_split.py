"""M0/M1: envelope model, batch split round-trip, stats, DLQ, compaction.

Automates the reference's manual checks: flattened-schema-vs-source
(image/image5.png vs image/image6.png) and per-table row counts
(image/image3.png) — SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.envelope import (
    DEFAULT_FIXTURE_TABLES,
    generate_cdc_envelopes,
    wrap,
)
from split_kinesis_streams_with_glue_spark.operators.compact import compact, event_time
from split_kinesis_streams_with_glue_spark.operators.split import (
    discover_tables,
    split_one,
    split_stats,
    split_tables,
    split_to_parquet,
)
from split_kinesis_streams_with_glue_spark.sources.json_envelope import (
    corrupt_records,
    infer_envelope_schema,
    read_envelopes,
    valid_envelopes,
)


def _read(spark, env_dir):
    schema = infer_envelope_schema(spark, env_dir)
    return read_envelopes(spark, env_dir, schema)


def test_envelope_wrap_shape(spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    env = wrap(src, "nation")
    assert set(env.columns) == {"data", "metadata"}
    meta = env.select("metadata.*").columns
    assert meta == [
        "timestamp", "record-type", "operation",
        "partition-key-type", "schema-name", "table-name",
    ]
    row = env.select(F.col("metadata.`timestamp`").alias("ts")).first()
    # ISO-8601 with microseconds + Z, as reference README.md:213
    assert row["ts"].endswith("Z") and "T" in row["ts"] and len(row["ts"]) == 27


def test_discover_tables(spark, envelope_fixture_dir):
    env = _read(spark, envelope_fixture_dir)
    assert discover_tables(env) == sorted(DEFAULT_FIXTURE_TABLES)


def test_split_load_roundtrip(spark, sf_dir, envelope_fixture_dir):
    """split(envelope(T)) == T for the full-load phase (round-trip property)."""
    env = _read(spark, envelope_fixture_dir)
    loads = env.filter(F.col("metadata.`operation`") == "load")
    nation = split_one(loads, "nation", keep_timestamp=False)
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert sorted(nation.columns) == sorted(src.columns)
    got = {tuple(r) for r in nation.select(*sorted(nation.columns)).collect()}
    want = {tuple(r) for r in src.select(*sorted(src.columns)).collect()}
    assert got == want


def test_per_table_schema_emerges(spark, envelope_fixture_dir):
    """Union data schema carries every table's columns; post-filter prune
    recovers the per-table schema (image/image2.png vs image/image4.png)."""
    env = _read(spark, envelope_fixture_dir)
    union_cols = set(env.select("data.*").columns)
    assert {"c_custkey", "o_orderkey", "n_nationkey"} <= union_cols
    nation = split_one(env, "nation", keep_timestamp=False)
    assert set(nation.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_split_stats_counts(spark, sf_dir, envelope_fixture_dir):
    env = _read(spark, envelope_fixture_dir)
    stats = {
        (r["table_name"], r["operation"]): r["n_records"]
        for r in split_stats(valid_envelopes(env)).collect()
    }
    n_customer = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert stats[("customer", "load")] == n_customer
    assert ("customer", "delete") in stats
    assert stats[("nation", "create-table")] == 1


def test_corrupt_records_routed(spark, envelope_fixture_dir):
    env = _read(spark, envelope_fixture_dir)
    bad = corrupt_records(env).collect()
    assert len(bad) == 2
    assert valid_envelopes(env).filter(F.col("_corrupt_record").isNotNull()).count() == 0


def test_split_to_parquet_single_pass(spark, envelope_fixture_dir, tmp_path):
    env = valid_envelopes(_read(spark, envelope_fixture_dir))
    paths = split_to_parquet(env, str(tmp_path / "target"))
    assert set(paths) == set(DEFAULT_FIXTURE_TABLES)
    person_like = spark.read.parquet(paths["customer"])
    assert person_like.count() > 0
    assert "c_custkey" in person_like.columns
    # queryable by name, Athena-style (reference image/image7.png)
    person_like.createOrReplaceTempView("target_customer")
    assert len(spark.sql("SELECT * FROM target_customer LIMIT 10").collect()) == 10


def test_cdc_compaction_final_state(spark, sf_dir):
    """compact(split(envelope_cdc(T))) == final_state(T) (SURVEY.md §5.2.3)."""
    env = generate_cdc_envelopes(spark, sf_dir, "customer", "c_custkey", "c_acctbal")
    cust = split_one(env, "customer", keep_operation=True)
    got = compact(event_time(cust), ["c_custkey"])

    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = (
        src.filter(F.col("c_custkey") % 7 != 0)
        .withColumn(
            "c_acctbal",
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 10 == 0, 200.0)
            .when(F.col("c_custkey") % 5 == 0, 100.0)
            .otherwise(0.0),
        )
    )
    cols = sorted(src.columns)
    got_rows = {tuple(r) for r in got.select(*cols).collect()}
    want_rows = {tuple(r) for r in want.select(*cols).collect()}
    assert got_rows == want_rows


def test_split_tables_wildcard(spark, envelope_fixture_dir):
    env = valid_envelopes(_read(spark, envelope_fixture_dir))
    frames = split_tables(env, "%")
    assert set(frames) == set(DEFAULT_FIXTURE_TABLES)
    for t, df in frames.items():
        assert df.count() > 0


def test_make_struct_and_project_choice_policies(spark):
    """make_struct: exactly one non-null branch per record, decided by the
    serialized form ('7' vs '7.5' vs '7.0'); project keeps one branch and
    nulls the rest; unparseable text nulls both branches."""
    from split_kinesis_streams_with_glue_spark.schema.choices import resolve_choices

    df = spark.createDataFrame(
        [("7",), ("-3",), ("7.5",), ("7.0",), ("2e3",), ("junk",), (None,)],
        "price string",
    )
    got = {
        r["orig"]: (r["s"]["int"], r["s"]["double"])
        for r in df.withColumn("orig", F.col("price"))
        .transform(lambda d: resolve_choices(d, {"price": "make_struct"}))
        .withColumnRenamed("price", "s")
        .collect()
    }
    assert got["7"] == (7, None)
    assert got["-3"] == (-3, None)
    assert got["7.5"] == (None, 7.5)
    assert got["7.0"] == (None, 7.0)  # serialized form decides, not value
    assert got["2e3"] == (None, 2000.0)
    assert got["junk"] == (None, None)
    assert got[None] == (None, None)

    proj = {
        r["orig"]: r["price"]
        for r in df.withColumn("orig", F.col("price"))
        .transform(lambda d: resolve_choices(d, {"price": "project:long"}))
        .collect()
    }
    assert proj["7"] == 7 and proj["7.5"] is None and proj["junk"] is None

    projd = {
        r["orig"]: r["price"]
        for r in df.withColumn("orig", F.col("price"))
        .transform(lambda d: resolve_choices(d, {"price": "project:double"}))
        .collect()
    }
    assert projd["7.5"] == 7.5 and projd["7"] is None
