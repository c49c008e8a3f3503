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
   metadata-scale: |shuffle partitions| rows, not |data| rows. For
   P ≤ 256 (the common case) the offset prefix is computed with ARRAY
   expressions over a single collected-list row — zero joins, so the
   whole offsets branch is one tiny aggregation; above 256 a two-level
   blocked triangular join bounds the work (see _offsets). Either way
   the final plan contains NO window with an empty partition spec
   (enforced by tests/test_plans.py).

The post-exchange copy is persisted (tracked via registry.persist_once,
released between queries by registry.release_internals): the offsets
branch and the main branch MUST observe the same physical partitioning,
and Spark does not guarantee exchange reuse across the two subtrees —
measured on 4.1.2, the two range exchanges sample independently, which
would silently mis-align partition ids.

Requirement: the order key must be a TOTAL order (add a unique tiebreak
column), otherwise ranks are nondeterministic across engines.

ADAPTIVE FAST PATH: the distributed form pays a fixed tax — boundary
sampling, a second persisted copy, the offsets branch, a broadcast join —
that only amortizes when the input is big enough that a one-task sort
would actually choke. Every public helper therefore persists its input,
counts it (one cheap job over the cache — the input is re-read by either
branch anyway), and below ``spark.bert_etl.globalOrder.smallRows``
(default 8M rows) collapses to the classic plan: one exchange to a single
partition + an ordinary window PARTITIONED BY the (constant) physical
partition id. That is a DELIBERATE single task over a measured-small
input — the plan invariant tests/test_plans.py enforces (no
empty-partition-spec window) still holds on both branches, and stays
meaningful: an accidental global window has an empty spec; this one
does not. Above the threshold the distributed machinery is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

_PID = "__go_pid"
_LOCAL = "__go_local"
_OFF = "__go_offset"
_TOTAL = "__go_total"

# Below this many input rows the single-partition window wins: the sort is
# seconds of one-core work, while the distributed form's fixed stage tax
# (sampling + offsets + broadcast) dominates. 8M rows of slim order
# columns is ~100-200 MB — comfortably one task. Tests force the
# distributed branch by setting the conf to "0" (strict < comparison).
SMALL_ROWS_CONF = "spark.bert_etl.globalOrder.smallRows"
SMALL_ROWS_DEFAULT = 8_000_000
# "false" disables the eager persist+count branch probe entirely (plan-only
# contexts): construction is lazy and always takes the distributed branch
ADAPTIVE_CONF = "spark.bert_etl.globalOrder.adaptive"


def _small_threshold(spark: SparkSession) -> int:
    try:
        return int(spark.conf.get(SMALL_ROWS_CONF, str(SMALL_ROWS_DEFAULT)))
    except Exception:
        return SMALL_ROWS_DEFAULT


def _prepared(df: DataFrame) -> tuple[DataFrame, int]:
    """Persist the input (released at the next release_internals()) and
    count it. Both branches re-read the input at least once more, and the
    distributed branch reads it twice (boundary sampling + shuffle map),
    so the cache replaces recomputation the old code paid anyway; the
    count is then one cheap pass over cached slim columns and buys the
    branch decision.

    The probe is EAGER (it runs Spark jobs and pins a cache at plan-
    construction time). Plan-only contexts — catalog explain, plan
    sweeps, building a DataFrame that may never execute — can opt out
    via ``spark.bert_etl.globalOrder.adaptive=false``: construction goes
    straight to the fully-distributed branch, lazily, with no persisted
    copy and no jobs."""
    from bert_etl_spark.operators.registry import persist_once

    try:
        adaptive = (
            df.sparkSession.conf.get(ADAPTIVE_CONF, "true").lower() != "false"
        )
    except Exception:
        adaptive = True
    if not adaptive:
        return df, 2**63 - 1  # "huge": always the distributed branch
    d = persist_once(df)
    return d, d.count()


def _single(df: DataFrame) -> DataFrame:
    """Deliberate one-task layout for measured-small inputs: an exchange
    to ONE partition (upstream stays parallel — never coalesce(1), which
    would collapse the input computation too) plus the physical partition
    id as a real, non-foldable partition column for the window."""
    return df.repartition(1).withColumn(_PID, F.spark_partition_id())


def rank_bounded(
    df: DataFrame, order: list[Column], rank_col: str = "rank"
) -> DataFrame:
    """Stamp a global 1..n rank on a BOUNDED frame (typically the k rows
    surviving an orderBy+limit) without an empty-partition-spec window:
    the _single idiom — one-partition exchange of the k rows plus
    spark_partition_id as a real partition key. Keeps the repo-wide
    no-global-windows invariant meaningful (an ACCIDENTAL corpus-sized
    global window still has an empty spec and still fails the sweep),
    while the deliberate one here moves only the already-bounded rows."""
    d = _single(df)
    w = W.partitionBy(_PID).orderBy(*order)
    return d.withColumn(rank_col, F.row_number().over(w)).drop(_PID)


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


_BLOCK = 256  # array-prefix / two-level switchover (see _offsets)


def _offsets(d: DataFrame, agg: Column, n_partitions: int) -> DataFrame:
    """Per-partition exclusive prefix of ``agg`` (count/sum of rows in all
    earlier partitions) + the grand total, over the metadata-scale
    per-partition table. The prefix keeps the aggregate's natural sum type
    — casting to a narrower type here would silently truncate fractional
    value columns.

    P ≤ 256: collect the P stat rows into ONE array and compute every
    exclusive prefix with array expressions (transform + slice +
    aggregate). O(P²) expression work on metadata-scale values — ~65k
    adds at P=256 — but ZERO joins, so the offsets branch is a single
    two-stage aggregation instead of a triangular-join cascade (measured:
    the join form cost ~10 extra AQE stage-jobs per call on local[32]).

    P > 256 (a 100 TB scan can carry 200k partitions): grouping
    partitions into blocks of B bounds the work at P·B + (P/B)² pairs
    (≈5·10⁷ at P=200k, B=256): block offsets come from a triangular join
    over P/B block totals, within-block offsets from a same-block
    triangular join, and the final offset is their sum. Either way:
    never a data-scale single task, no empty-partition-spec window."""
    per = d.groupBy(_PID).agg(agg.alias("_v"))
    vt = dict(per.dtypes)["_v"]
    zero = F.lit(0).cast(vt)

    if n_partitions <= _BLOCK:
        arr = per.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(_PID).alias("p"), F.col("_v").alias("v")))
            ).alias("a")
        )
        # SQL-string lambdas: one py4j round-trip instead of dozens (the
        # Column-API form measurably inflates driver-side build time).
        # The merge result is cast back to the zero type each step:
        # higher-order aggregate needs a stable accumulator type (decimal
        # addition would otherwise widen per step).
        prefix = (
            "transform(a, (s, i) -> struct(s.p as p, "
            f"aggregate(slice(a, 1, i), cast(0 as {vt}), "
            f"(acc, x) -> cast(acc + x.v as {vt})) as o))"
        )
        total = (
            f"aggregate(a, cast(0 as {vt}), (acc, x) -> cast(acc + x.v as {vt}))"
        )
        return arr.select(
            F.explode(F.expr(prefix)).alias("s"), F.expr(total).alias(_TOTAL)
        ).select(
            F.col("s.p").alias(_PID), F.col("s.o").alias(_OFF), _TOTAL
        )

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
    total = per.agg(F.sum("_v").alias(_TOTAL))
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
    """Exact 1-based global row_number over a total order; adaptive
    (single-partition window below the smallRows threshold, distributed
    range-exchange + offsets form above)."""
    d0, n_rows = _prepared(df)
    w = W.partitionBy(_PID).orderBy(*order_cols)
    if n_rows < _small_threshold(df.sparkSession):
        out = _single(d0).withColumn(
            rank_col, F.row_number().over(w).cast("long")
        )
        if keep_total:
            out = out.withColumn(keep_total, F.lit(n_rows).cast("long"))
        return out.drop(_PID)
    d, n = _ranged(d0, order_cols, partitions)
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
    """Exact inclusive running SUM(value) over a total order; adaptive
    (see with_global_rank)."""
    d0, n_rows = _prepared(df)
    w = (
        W.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if n_rows < _small_threshold(df.sparkSession):
        return (
            _single(d0)
            .withColumn(cumsum_col, F.sum(value_col).over(w))
            .drop(_PID)
        )
    d, n = _ranged(d0, order_cols, partitions)
    return (
        d.join(F.broadcast(_offsets(d, F.sum(value_col), n)), _PID)
        .withColumn(cumsum_col, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF, _TOTAL)
    )


def _tile_expr(rank: Column, total: Column, n_tiles: int) -> Column:
    """Standard SQL ntile bucket math from an exact 1-based global rank.

    Both Spark and DuckDB implement it: with N rows, q = N div n and
    rem = N mod n, the first ``rem`` buckets hold q+1 rows, the rest q.
    """
    q = F.floor(total / n_tiles)
    rem = total % n_tiles
    big = q + 1
    small = F.greatest(q, F.lit(1))  # guard: q=0 branch is never selected
    boundary = rem * big  # ranks <= boundary land in the big buckets
    return (
        F.when(rank <= boundary, F.ceil(rank / big))
        .otherwise(rem + F.ceil((rank - boundary) / small))
        .cast("int")
    )


def with_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[Column],
    tile_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact ntile(n) over a total order, distributed (see _tile_expr)."""
    rank = "__go_rank"
    d = with_global_rank(df, order_cols, rank, partitions, keep_total="__go_n")
    return d.withColumn(
        tile_col, _tile_expr(F.col(rank), F.col("__go_n"), n_tiles)
    ).drop(rank, "__go_n")


def with_ntile_multi(
    df: DataFrame,
    n_tiles: int,
    metrics: list[tuple[str, Column]],
    tiebreak: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact ntile(n) under SEVERAL orderings in ONE distributed pass.

    ``metrics``: (tile_col, key) pairs where ``key`` is a numeric column
    ASCENDING-encoded for the desired order (negate for DESC — exact for
    integers below 2^53 and all non-NaN doubles; Spark normalizes -0.0).
    ``tiebreak``: a unique column completing the total order, ascending.

    Chaining M with_ntile calls costs M range exchanges and M cached
    copies, and each pass re-reads the previous pass's output twice
    (boundary sampling + shuffle map). Here the frame is unpivoted to
    (metric, key) rows — M·N rows, one range exchange on
    (metric, key, tiebreak), one cached copy, one offsets pass with
    per-metric prefixes, then a fold back to one row per input row. The
    M orderings ride the SAME machinery because range partitioning on
    (metric, key) keeps each metric's rows contiguous and ordered.
    """
    d0, n_rows = _prepared(df)
    if n_rows < _small_threshold(df.sparkSession):
        # measured-small: M ordinary windows over ONE deliberate partition
        # — no explode to M·N rows, no offsets pass, no fold-back groupBy.
        out = _single(d0)
        total = F.lit(n_rows).cast("long")
        for tile_col, key in metrics:
            w = W.partitionBy(_PID).orderBy(
                key.cast("double").asc(), F.col(tiebreak).asc()
            )
            out = out.withColumn(
                tile_col, _tile_expr(F.row_number().over(w), total, n_tiles)
            )
        return out.drop(_PID)

    df = d0
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    from bert_etl_spark.operators.registry import persist_once

    payload = df.columns
    stacked = df.select(
        *payload,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("m"), key.cast("double").alias("k")
                    )
                    for i, (_, key) in enumerate(metrics)
                ]
            )
        ).alias("__go_mk"),
    ).select(*payload, F.col("__go_mk.m").alias("__go_m"), F.col("__go_mk.k").alias("__go_k"))

    d = persist_once(
        stacked.repartitionByRange(
            n, F.col("__go_m"), F.col("__go_k"), F.col(tiebreak)
        ).withColumn(_PID, F.spark_partition_id())
    )

    # per-(partition, metric) counts -> per-metric exclusive prefixes over
    # partition order, with the same one-array-row trick as _offsets. A
    # partition straddling two metrics is handled by grouping on both.
    per = d.groupBy("__go_m", _PID).agg(F.count(F.lit(1)).alias("_v"))
    arr = per.groupBy("__go_m").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(_PID).alias("p"), F.col("_v").alias("v")))
        ).alias("a")
    )
    prefix = (
        "transform(a, (s, i) -> struct(s.p as p, "
        "aggregate(slice(a, 1, i), 0L, (acc, x) -> acc + x.v) as o))"
    )
    off = arr.select(
        "__go_m",
        F.explode(F.expr(prefix)).alias("s"),
        F.expr("aggregate(a, 0L, (acc, x) -> acc + x.v)").alias(_TOTAL),
    ).select(
        "__go_m", F.col("s.p").alias(_PID), F.col("s.o").alias(_OFF), _TOTAL
    )

    w = W.partitionBy(_PID, "__go_m").orderBy("__go_k", tiebreak)
    ranked = d.join(F.broadcast(off), ["__go_m", _PID]).withColumn(
        "__go_rank", (F.row_number().over(w) + F.col(_OFF)).cast("long")
    )
    tiled = ranked.withColumn(
        "__go_tile", _tile_expr(F.col("__go_rank"), F.col(_TOTAL), n_tiles)
    )
    # fold the M tile rows per input row back to one row. The payload is
    # functionally dependent on the unique tiebreak, so grouping on all
    # payload columns is exact (and avoids a join back to df).
    return tiled.groupBy(*payload).agg(
        *[
            F.max(F.when(F.col("__go_m") == i, F.col("__go_tile"))).alias(tile_col)
            for i, (tile_col, _) in enumerate(metrics)
        ]
    )
