"""NTZ-safe event-time accessors.

The physical type of an event-time column depends on the writer and the
Spark version reading it: the same ``timestamp[us]`` parquet column arrives
as TIMESTAMP (LTZ) on Spark <4, as TIMESTAMP_NTZ on Spark 4.x (where
``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to true), and as
``bigint`` nanoseconds under the ``nanosAsLong`` legacy flag. Epoch
extractors like ``unix_micros`` only accept LTZ, so every operator that
does raw timestamp arithmetic must go through these helpers instead —
they cast to the canonical LTZ type first, which is lossless because the
engine pins the session timezone to UTC (``registry.tbl``/``session.py``).

The reference normalizes datetimes at its codec boundary to one pinned
wire format (bert/constants.py:19, bert/encoders/base.py:14-15); this
module is that boundary for the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_ltz(c: Column | str) -> Column:
    """Canonical event-time type: TIMESTAMP (LTZ).

    NTZ → LTZ is a reinterpretation under the pinned UTC session timezone
    (identity on the wall-clock value); LTZ → LTZ is a no-op; the cast is
    constant-folded per row with zero shuffle impact.
    """
    return _col(c).cast("timestamp")


def epoch_micros(c: Column | str) -> Column:
    """Microseconds since epoch, tolerant of NTZ/LTZ input."""
    return F.unix_micros(as_ltz(c))


def epoch_millis(c: Column | str) -> Column:
    """Milliseconds since epoch, tolerant of NTZ/LTZ input."""
    return F.unix_millis(as_ltz(c))


def epoch_seconds(c: Column | str) -> Column:
    """Whole seconds since epoch, tolerant of NTZ/LTZ input."""
    return F.unix_seconds(as_ltz(c))
