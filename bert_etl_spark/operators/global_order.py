"""Exact global-order primitives without a global-window bottleneck.

``ntile() OVER (ORDER BY ...)`` / ``row_number() OVER (ORDER BY ...)`` /
``SUM() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` with an EMPTY
partition spec force every row through ONE WindowExec task — the
single-executor chokepoint that turns a 1000-node cluster into one core.
These helpers compute the same exact results the way a distributed sort
does it:

1. ``repartitionByRange`` on the order key (sampled range exchange —
   the same machinery as a global sort, parallel and skew-balanced);
2. per-partition local windows PARTITIONED BY the physical partition id
   (runs on all cores);
3. a partition-offset table — ONE row per partition (count / sum of the
   rows before it) — joined back via broadcast. Offsets are
   metadata-scale: |shuffle partitions| rows, not |data| rows. The
   offset prefix-sum itself is a triangular self-join over that tiny
   table, so the final plan contains NO window with an empty partition
   spec (enforced by tests/test_plans.py).

Requirement: the order key must be a TOTAL order (add a unique tiebreak
column), otherwise ranks are nondeterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PID = "__go_pid"
_LOCAL = "__go_local"
_OFF = "__go_offset"
_TOTAL = "__go_total"


def _ranged(
    df: DataFrame, order_cols: list[Column], partitions: int | None
) -> tuple[DataFrame, int]:
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    from bert_etl_spark.operators.registry import persist_once

    # persist: the partition stats pass and the main pass must see the SAME
    # physical partitioning (spark_partition_id is plan-sensitive)
    return (
        persist_once(
            df.repartitionByRange(n, *order_cols).withColumn(
                _PID, F.spark_partition_id()
            )
        ),
        n,
    )


_BLOCK = 256  # two-level prefix block width (see _offsets)


def _offsets(d: DataFrame, agg: Column, n_partitions: int) -> DataFrame:
    """Per-partition exclusive prefix of ``agg`` (count/sum of rows in all
    earlier partitions) + the grand total, over the metadata-scale
    per-partition table. The prefix keeps the aggregate's natural sum type
    — casting here would silently truncate fractional value columns.

    A naive triangular self-join is O(P²) pairs in partition count P —
    irrelevant at P≤256 (the common case, taken as a single triangular
    join since P is known at plan time), real at P=200k (a 100 TB scan).
    There, grouping partitions into blocks of B bounds the work at
    P·B + (P/B)² pairs (≈5·10⁷ at P=200k, B=256): block offsets come from
    a triangular join over P/B block totals, within-block offsets from a
    same-block triangular join, and the final offset is their sum. Either
    way: never a data-scale single task, no empty-partition-spec window."""
    per = d.groupBy(_PID).agg(agg.alias("_v"))
    zero = F.lit(0).cast(dict(per.dtypes)["_v"])
    total = per.agg(F.sum("_v").alias(_TOTAL))

    if n_partitions <= _BLOCK:
        a, b = per.alias("a"), per.alias("b")
        off = (
            a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
            .groupBy(F.col(f"a.{_PID}").alias(_PID))
            .agg(F.coalesce(F.sum("b._v"), zero).alias(_OFF))
        )
        return off.crossJoin(total)

    per = per.withColumn("_blk", F.floor(F.col(_PID) / _BLOCK))
    bt = per.groupBy("_blk").agg(F.sum("_v").alias("_bv"))
    ba, bb = bt.alias("ba"), bt.alias("bb")
    block_off = (
        ba.join(bb, F.col("bb._blk") < F.col("ba._blk"), "left")
        .groupBy(F.col("ba._blk").alias("_blk"))
        .agg(F.coalesce(F.sum("bb._bv"), zero).alias("_boff"))
    )
    a, b = per.alias("a"), per.alias("b")
    within_off = (
        a.join(
            b,
            (F.col("b._blk") == F.col("a._blk"))
            & (F.col(f"b.{_PID}") < F.col(f"a.{_PID}")),
            "left",
        )
        .groupBy(F.col(f"a.{_PID}").alias(_PID), F.col("a._blk").alias("_blk"))
        .agg(F.coalesce(F.sum("b._v"), zero).alias("_woff"))
    )
    off = (
        within_off.join(F.broadcast(block_off), "_blk")
        .select(_PID, (F.col("_boff") + F.col("_woff")).alias(_OFF))
    )
    return off.crossJoin(total)


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str,
    partitions: int | None = None,
    keep_total: str | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over a total order, distributed."""
    d, n = _ranged(df, order_cols, partitions)
    w = W.partitionBy(_PID).orderBy(*order_cols)
    out = (
        d.join(F.broadcast(_offsets(d, F.count(F.lit(1)), n)), _PID)
        .withColumn(rank_col, (F.row_number().over(w) + F.col(_OFF)).cast("long"))
    )
    if keep_total:
        out = out.withColumn(keep_total, F.col(_TOTAL).cast("long"))
    return out.drop(_PID, _OFF, _TOTAL)


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cumsum_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running SUM(value) over a total order, distributed."""
    d, n = _ranged(df, order_cols, partitions)
    w = (
        W.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.join(F.broadcast(_offsets(d, F.sum(value_col), n)), _PID)
        .withColumn(cumsum_col, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF, _TOTAL)
    )


def with_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[Column],
    tile_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact ntile(n) over a total order, distributed.

    Standard SQL ntile bucket math (both Spark and DuckDB implement it):
    with N rows, q = N div n and rem = N mod n, the first ``rem`` buckets
    hold q+1 rows, the rest q — derived here arithmetically from the exact
    global rank instead of a single-task window.
    """
    rank = "__go_rank"
    d = with_global_rank(df, order_cols, rank, partitions, keep_total="__go_n")
    q = F.floor(F.col("__go_n") / n_tiles)
    rem = F.col("__go_n") % n_tiles
    big = q + 1
    small = F.greatest(q, F.lit(1))  # guard: q=0 branch is never selected
    boundary = rem * big  # ranks <= boundary land in the big buckets
    tile = F.when(
        F.col(rank) <= boundary, F.ceil(F.col(rank) / big)
    ).otherwise(rem + F.ceil((F.col(rank) - boundary) / small))
    return d.withColumn(tile_col, tile.cast("int")).drop(rank, "__go_n")
