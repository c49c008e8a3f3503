"""Persistent-layout marker files for at-rest tables.

An at-rest table whose LAYOUT is derived from a session conf (the LSH
ledger's bucket modulus, the MaxSim index's quantizer size) must pin that
conf into the data directory itself: a reader running under a drifted conf
would silently mis-prune paths. These helpers stamp and read one small
integer marker per layout property, with two hardening rules (round-9
advice items):

- WRITES are atomic: the value lands in a temp file that is RENAMEd into
  place (rename is atomic on HDFS/posix), so a crash mid-write can never
  leave a half-written marker that poisons every later restart.
- READS fail with an explanatory error on a corrupt/empty marker instead
  of a raw ``ValueError: invalid literal for int()``.

Reference anchor: the reference persists its collection layout with the
dataset itself (/root/reference/bert/etl/__init__.py:86-164) rather than
re-deriving it per process.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def read_int_marker(spark: SparkSession, path: str) -> int | None:
    """The integer stamped at ``path``, or None if the marker does not
    exist. A marker that exists but does not parse raises with the path
    and raw content — the caller's layout contract is broken, not a bug
    in the caller. Reads take the local-FS fast path when the path is
    local (functions/fsfast — marker reads run per micro-batch epoch
    and per verb tripwire, and the Hadoop route costs 3 JVM round trips
    each; writes stay on the Hadoop path for one atomic-rename
    implementation)."""
    from bert_etl_spark.functions.fsfast import NOT_LOCAL, read_small_file

    txt = read_small_file(path)
    if txt is NOT_LOCAL:
        fs, p, jvm = _fs_path(spark, path)
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
    if txt is None:
        return None
    try:
        return int(txt.strip())
    except ValueError:
        raise ValueError(
            f"layout marker {path} exists but holds {txt!r} instead of an "
            "integer — it was corrupted (e.g. a crash mid-write on a "
            "filesystem without atomic rename); restore it to the value "
            "the table was created with, or rebuild the table"
        ) from None


def write_int_marker(spark: SparkSession, path: str, value: int) -> None:
    """Atomically stamp ``value`` at ``path`` (write temp, rename over)."""
    fs, p, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}._tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(str(int(value)).encode("utf-8")))
    finally:
        stream.close()
    # posix/HDFS rename onto an existing path fails; delete a stale target
    # first (markers are immutable once stamped, so this only fires when a
    # prior crash left both files)
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"could not rename {tmp} over marker {path}")


def read_text_marker(spark: SparkSession, path: str) -> str | None:
    """The text stamped at ``path`` (e.g. a schema DDL artifact), or None
    if it does not exist — the string twin of read_int_marker, same
    atomic-rename write contract and same local-FS read fast path."""
    from bert_etl_spark.functions.fsfast import NOT_LOCAL, read_small_file

    txt = read_small_file(path)
    if txt is not NOT_LOCAL:
        return txt
    fs, p, jvm = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_marker(spark: SparkSession, path: str, value: str) -> None:
    """Atomically stamp ``value`` at ``path`` (write temp, rename over) —
    the string twin of write_int_marker."""
    fs, p, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}._tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(str(value).encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"could not rename {tmp} over marker {path}")
