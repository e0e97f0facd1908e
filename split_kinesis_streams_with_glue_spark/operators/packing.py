"""Sequence packing for LLM training-data pipelines (SURVEY.md §2.6 X5):
map every document to its token offset in a deterministic corpus-wide
concatenation, and to the fixed-length training sequence that offset lands
in — the "concat-and-chunk" packing used to build pretraining batches.

The hard part at scale is the corpus-wide running total: a naive
``SUM() OVER (ORDER BY id)`` with no partition key collapses the whole
corpus onto ONE task (Spark's WindowExec warns exactly this). The engine
instead computes a distributed two-phase prefix sum:

1. range-partition on the (unique) order key — Spark's range partitioner
   guarantees every row in partition p sorts before every row in p+1;
2. per-partition running sums via a window PARTITIONED on the physical
   partition id (bounded state, fully parallel);
3. per-partition totals are a ``num_partitions``-row aggregate — collected
   to the driver (metadata-sized, never data-sized), turned into exclusive
   base offsets, and broadcast-joined back.

Wall-clock is two linear passes + one tiny broadcast; no single-task stage
at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.functions.textfns import TOKEN_PATTERN


def prefix_sums(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "start_offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` in ``order_col`` order (the
    sum of all strictly-preceding rows), distributed as described in the
    module docstring. ``order_col`` must be unique — ties would make the
    within-partition ordering, and therefore the offsets, nondeterministic.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # freeze the range partitioning + partition ids: both the totals pass
    # and the main pass consume them, and a recompute could re-sample
    # different range boundaries
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = sorted(
        parted.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    )  # <= num_partitions rows: metadata-sized driver collect
    base, offsets = 0, []
    for row in totals:
        offsets.append((row["__pid"], base))
        base += row["__t"] or 0
    offsets_df = spark.createDataFrame(offsets, "__pid int, __base bigint")
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.withColumn("__run", F.sum(value_col).over(w))
        .join(F.broadcast(offsets_df), "__pid")
        .withColumn(
            out_col,
            (F.col("__base") + F.col("__run") - F.col(value_col)).cast("long"),
        )
        .drop("__pid", "__run", "__base")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: documents are concatenated in ``id_col``
    order and sliced into ``seq_len``-token training sequences. Output per
    document: ``n_tokens``, its ``start_offset`` in the concatenation, the
    ``seq_id`` its first token lands in, and ``n_seqs`` — how many
    sequences the document spans (1 unless it straddles a boundary).

    Token counts default to the BPE-ish regex tokenizer (same rule as
    ``text.token_counts``) so packing needs no external tokenizer.
    """
    if token_col is None:
        df = df.withColumn(
            "n_tokens",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0))
            .cast("long"),
        )
        token_col = "n_tokens"
    out = prefix_sums(df, token_col, id_col)
    start, ntok = F.col("start_offset"), F.col(token_col).cast("long")
    last = start + F.greatest(ntok, F.lit(1)) - 1  # last token's offset
    return out.select(
        id_col,
        ntok.alias("n_tokens"),
        start,
        F.expr(f"start_offset DIV {seq_len}").alias("seq_id"),
        (
            (last - last % seq_len) / seq_len
            - F.expr(f"start_offset DIV {seq_len}")
            + 1
        ).cast("long").alias("n_seqs"),
    )
