"""Deterministic content identity — the reference's QueueItem identity, fixed.

The reference computes ``sha256(json(payload) + uuid4)`` (`bert/queues.py:29-35`
in /root/reference), which is non-deterministic by construction; its S3 dedup
ledger drops the uuid and sorts keys (`bert/etl/__init__.py:57-60`). We adopt
the deterministic variant everywhere (intentional divergence, SURVEY §4.3.1):

    identity = sha256(canonical_json(row))

canonical_json = ``to_json(struct(columns in sorted name order))`` — Spark's
to_json emits struct fields in declaration order, so sorting the column list
fixes key order and makes hashes stable across runs, partitions, and engines.

Scale note: a single JVM-side sha2 over a generated JSON string per row —
whole-stage-codegen'd, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def identity_col(df: DataFrame, cols: list[str] | None = None) -> Column:
    """sha256 hex of the canonical-JSON of the given columns (default: all)."""
    names = sorted(cols if cols is not None else df.columns)
    return F.sha2(F.to_json(F.struct(*[F.col(n) for n in names])), 256)


def with_identity(
    df: DataFrame, cols: list[str] | None = None, out: str = "identity"
) -> DataFrame:
    return df.withColumn(out, identity_col(df, cols))


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup on content identity (keeps an arbitrary representative,
    like ``dropDuplicates``). For keyed 'keep-first' semantics use
    operators.dedup.keep_first."""
    return with_identity(df, cols).dropDuplicates(["identity"]).drop("identity")
