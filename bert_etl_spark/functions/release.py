"""Deterministic release of checkpointed/persisted DataFrames.

``Dataset.unpersist`` only removes cacheManager entries; for a
``localCheckpoint``'d DataFrame it is a NO-OP in Spark 4.1 — the
checkpoint's blocks live on a persisted RDD the cacheManager never saw,
and they free only when the ContextCleaner gets around to the GC'd
reference (verified: persisted-RDD count unchanged after
``df.unpersist()``). Per-batch code (always-on ingest, iterative graph
hops) cannot rely on that: one leaked block set per micro-batch grows
without bound. This helper releases the ACTUAL storage: when the frame's
analyzed plan is the ``LogicalRDD`` a localCheckpoint produces, it
unpersists that underlying RDD directly; otherwise it falls back to the
ordinary ``Dataset.unpersist`` (which does work for ``persist()``'d
frames).

Reference anchor: the reference's per-item state is external
(Redis/DynamoDB, /root/reference/bert/queues.py) so it never faces
in-process block hygiene; a long-lived Spark session must manage it
explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release(df: DataFrame) -> bool:
    """Free the storage behind ``df`` now. Returns True when a
    checkpointed RDD was unpersisted directly (the case Dataset.unpersist
    cannot handle), False when only the ordinary unpersist path ran.
    Safe on any DataFrame — never raises."""
    try:
        df.unpersist()  # handles cacheManager-registered persist()
    except Exception:
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return True
    except Exception:
        pass
    return False
