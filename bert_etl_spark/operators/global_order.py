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


def _ranged(df: DataFrame, order_cols: list[Column], partitions: int | None) -> DataFrame:
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    from bert_etl_spark.operators.registry import persist_once

    # persist: the partition stats pass and the main pass must see the SAME
    # physical partitioning (spark_partition_id is plan-sensitive)
    return persist_once(
        df.repartitionByRange(n, *order_cols).withColumn(_PID, F.spark_partition_id())
    )


def _offsets(d: DataFrame, agg: Column) -> DataFrame:
    """Per-partition exclusive prefix of ``agg`` (count/sum of rows in all
    earlier partitions) + the grand total, via triangular self-join on the
    metadata-scale per-partition table."""
    per = d.groupBy(_PID).agg(agg.alias("_v"))
    a, b = per.alias("a"), per.alias("b")
    off = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum("b._v"), F.lit(0)).cast("long").alias(_OFF))
    )
    total = per.agg(F.sum("_v").cast("long").alias(_TOTAL))
    return off.crossJoin(total)


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str,
    partitions: int | None = None,
    keep_total: str | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over a total order, distributed."""
    d = _ranged(df, order_cols, partitions)
    w = W.partitionBy(_PID).orderBy(*order_cols)
    out = (
        d.join(F.broadcast(_offsets(d, F.count(F.lit(1)))), _PID)
        .withColumn(rank_col, (F.row_number().over(w) + F.col(_OFF)).cast("long"))
    )
    if keep_total:
        out = out.withColumn(keep_total, F.col(_TOTAL))
    return out.drop(_PID, _OFF, _TOTAL)


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cumsum_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running SUM(value) over a total order, distributed."""
    d = _ranged(df, order_cols, partitions)
    w = (
        W.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.join(F.broadcast(_offsets(d, F.sum(value_col))), _PID)
        .withColumn(cumsum_col, (F.sum(value_col).over(w) + F.col(_OFF)).cast("long"))
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
