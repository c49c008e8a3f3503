"""Order-insensitive float aggregation.

Floating-point SUM/AVG over a shuffled dataset is not deterministic: partial
aggregates combine in partition order, and (a+b)+c != a+(b+c) in IEEE 754.
That breaks (1) run-to-run reproducibility at 100 TB and (2) value-hash
comparison against the DuckDB oracle.

Fix: round each row's value to a fixed decimal scale (exact in DECIMAL),
sum in DECIMAL (exact, associative, order-free), cast the total back to
DOUBLE. Per-row double arithmetic stays deterministic (same IEEE ops in both
engines); only the reduction is moved to exact arithmetic. DECIMAL sums are
also cheap JVM-side (Spark uses long-backed Decimal128 here).

The `sql_*` helpers emit the equivalent DuckDB SQL so oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 integer digits + 6 fraction digits: Spark widens sum(DECIMAL(25,6)) to
# DECIMAL(35,6), DuckDB to DECIMAL(38,6) — numerically identical totals.
_PRECISION = 25
_SCALE = 6


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic SUM of a double column (exact decimal reduction)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal({_PRECISION},{_SCALE})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic AVG: decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal({_PRECISION},{_SCALE})")).cast("double")
    out = total / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum` over expression ``expr``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{_SCALE}))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`davg`."""
    return f"({sql_dsum(expr)} / COUNT({expr}))"
