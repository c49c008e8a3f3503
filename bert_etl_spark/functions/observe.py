"""Reliable ``DataFrame.observe`` metrics under AQE.

The lifecycle verbs fold their driver-synchronous gate counts (batch
size, touched partitions, fresh-row count, fold size) into the action
they already run — one job instead of two — via observed metrics
(round-14 batch 4). One Spark gap makes that unreliable out of the box:
``AQEPropagateEmptyRelation`` replaces a RUNTIME-empty subtree with an
empty LocalRelation and drops the ``CollectMetrics`` node with it, so an
observation on a subtree that turns out empty (a fully-duplicate replay
batch, a no-op delete) either never completes or is unblocked with a
schemaless empty row that ``Observation.get`` cannot convert (the
PythonSQLUtils.toPyRow assertion). Measured and reproduced on 4.1.2; the
STATIC PropagateEmptyRelation rule preserves CollectMetrics — only the
AQE variant loses it.

``reliable_metrics`` scopes an exclusion of exactly that AQE rule around
the observed action(s): inside the scope every observation completes
with real values (zero counts included). The cost is that a runtime-
empty subtree inside the scope executes as a real (empty, tiny) plan
instead of being folded away — nothing, for the bounded maintenance
batches these verbs process; every analytic query plan outside the
scope keeps the stock rule set.
"""

from __future__ import annotations

from contextlib import contextmanager

_CONF = "spark.sql.adaptive.optimizer.excludedRules"
_RULE = (
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
)


def observed_distinct(df, col) -> list:
    """The distinct values of ``col`` over ``df``, collected to the
    driver BOUNDED: the set rides a shuffle-free noop scan as an
    observed ``collect_set`` metric, so the driver receives at most the
    value-domain cardinality (a bucket/cell modulus — 64ish ints) no
    matter how many rows the frame holds. The bare ``.collect()`` it
    replaces materialized one row per input row on the driver — O(64)
    for a serving probe but O(|request|) for a bulk delete feed
    (round-14 advice, 'medium' item #2) — and paid a dedup shuffle
    where this pays none. Exactly ONE driver-synchronous job either
    way. ``col``: a column name or Column expression."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    obs = Observation()
    with reliable_metrics(df.sparkSession):
        (
            df.select(c.alias("v"))
            .observe(obs, F.collect_set("v").alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return sorted(obs.get["s"])


@contextmanager
def reliable_metrics(spark):
    """Make observed metrics reliable for actions run inside the scope
    (see module docstring). Re-entrant and restore-exact; the conf is
    session-scoped, so like the other scoped-conf verbs (the CDC apply's
    coalescing floor) this assumes the verb is not racing a conf writer
    on the same session — the single-writer lane every maintenance verb
    already runs in."""
    prev = spark.conf.get(_CONF, None)
    if prev and _RULE in prev:
        yield
        return
    spark.conf.set(_CONF, f"{prev},{_RULE}" if prev else _RULE)
    try:
        yield
    finally:
        if prev is None:
            try:
                spark.conf.unset(_CONF)
            except Exception:
                pass
        else:
            spark.conf.set(_CONF, prev)
