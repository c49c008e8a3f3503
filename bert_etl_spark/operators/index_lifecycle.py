"""Shared lifecycle for the durable partition-pruned similarity indexes.

The three at-rest ANN indexes (MaxSim cells, sign-LSH buckets, single-vector
IVF cells) all share one physical contract: a ``partitionBy(<part>)`` parquet
table under a conf'd directory, an atomic integer layout marker
(``_n_centroids`` / ``_n_planes``) stamped by ``functions.markers``, probes
that path-prune to the probed partition dirs, idempotent ingest (anti-join on
the content key), and compaction back to one file per partition. This module
is that contract written once, so the three families cannot drift.

Crash-safety protocol (round-10 advice, the 'high' item): the index stops
being a pure function of (corpus, constants) the moment ingest exists —
ingested documents need not be derivable from the corpus, so "marker-less
dir => rebuild from corpus" would silently DROP them after a crash. Instead:

- FRESH BUILD stamps a ``_building`` sentinel before writing any data and
  removes it after the layout marker lands. A crash mid-build leaves
  (sentinel, partial data, no marker): since ingest REFUSES to run without a
  marker, such a dir provably contains only corpus-derived rows — safe to
  wipe and rebuild.
- COMPACTION writes the full rewritten table to a sibling ``_compact_tmp``
  dir FIRST, then stamps a ``_compact_pending`` sentinel (carrying the layout
  value), then deletes the marker, then swaps partition dirs one by one, then
  re-stamps the marker and cleans up. From the sentinel onward a crash at ANY
  step is recoverable from the already-written tmp table: the swap is
  per-partition delete+rename, so re-running it finishes whatever the crash
  left half-done (``finish_compaction_swap``). Readers recover on open.
- A marker-less dir that holds partition data but NEITHER sentinel has no
  recovery record (manual marker deletion, foreign data) — ``open_index``
  REFUSES rather than overwriting possibly-ingested documents.

Single-writer assumption, stated explicitly: ingest and compaction are
maintenance operations on the same table directory and MUST NOT run
concurrently with each other (a compact swaps the very dirs an in-flight
ingest appends into). Probes/readers are safe concurrent with ingest
(parquet readers list files once) but not with a compact's swap window.
The reference's analog runs dataset maintenance through one queue worker
(/root/reference/bert/etl/__init__.py:86-164); on Spark, schedule compaction
in the ingest job's own trigger loop or behind an external lock. Ingest
re-validates the marker immediately before its append as a cheap tripwire
(round-10 advice, the 'low' item), narrowing — not closing — that window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BUILDING_SENTINEL = "_building"
PENDING_SENTINEL = "_compact_pending"
TMP_SUFFIX = "_compact_tmp"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def p(s: str):
        return jvm.org.apache.hadoop.fs.Path(s)

    return p(path).getFileSystem(hconf), p


def _part_dirs(fs, p, root: str, part_col: str) -> list:
    st = fs.globStatus(p(f"{root}/{part_col}=*"))
    return [] if st is None else [s.getPath() for s in st]


def finish_compaction_swap(
    spark: SparkSession, index_dir: str, marker_name: str, part_col: str
) -> None:
    """Complete (or re-complete) a compaction swap from the sibling tmp
    table. Idempotent under crash/re-run: every partition dir still in
    tmp replaces its root counterpart (delete+rename per dir — a dir
    already swapped by the crashed run is simply not in tmp anymore),
    then the layout marker is re-stamped from the ``_compact_pending``
    sentinel and the sentinel + tmp dir are removed. The tmp table is a
    FULL rewrite, so every root partition holding rows has a tmp
    counterpart — stale root dirs cannot survive the swap."""
    from bert_etl_spark.functions.markers import read_int_marker, write_int_marker

    sentinel = f"{index_dir}/{PENDING_SENTINEL}"
    value = read_int_marker(spark, sentinel)
    if value is None:
        raise ValueError(
            f"no pending compaction at {index_dir} — nothing to finish"
        )
    tmp = f"{index_dir}{TMP_SUFFIX}"
    fs, p = _fs(spark, index_dir)
    for src in _part_dirs(fs, p, tmp, part_col):
        dst = p(f"{index_dir}/{src.getName()}")
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(src, dst):
            raise IOError(f"compaction swap failed moving {src}")
    write_int_marker(spark, f"{index_dir}/{marker_name}", value)
    fs.delete(p(sentinel), False)
    fs.delete(p(tmp), True)


def open_index(
    spark: SparkSession, index_dir: str, marker_name: str, part_col: str
) -> int | None:
    """Validate/recover the durable index at ``index_dir``.

    Returns the stamped layout value, or None when the dir is verified
    safe to build into (empty, or an abandoned fresh build that was wiped).
    Recovers an interrupted compaction from its tmp table; clears stale
    post-commit debris; REFUSES a marker-less dir that holds partition
    data with no recovery record."""
    from bert_etl_spark.functions.markers import read_int_marker

    marker_path = f"{index_dir}/{marker_name}"
    marker = read_int_marker(spark, marker_path)
    fs, p = _fs(spark, index_dir)
    if marker is not None:
        # debris from a crash AFTER the commit point (marker stamped):
        # a finished build's sentinel, a finished compact's sentinel/tmp
        for leftover in (PENDING_SENTINEL, BUILDING_SENTINEL):
            lp = p(f"{index_dir}/{leftover}")
            if fs.exists(lp):
                fs.delete(lp, False)
        tmp = p(f"{index_dir}{TMP_SUFFIX}")
        if fs.exists(tmp):
            fs.delete(tmp, True)
        return marker
    if read_int_marker(spark, f"{index_dir}/{PENDING_SENTINEL}") is not None:
        # interrupted compaction: the tmp table was fully written before
        # the sentinel landed — finish the swap instead of rebuilding
        finish_compaction_swap(spark, index_dir, marker_name, part_col)
        return read_int_marker(spark, marker_path)
    if read_int_marker(spark, f"{index_dir}/{BUILDING_SENTINEL}") is not None:
        # abandoned fresh build: no marker was ever stamped, so ingest
        # (which requires one) can never have added rows — the partial
        # table is pure corpus derivation, safe to wipe and rebuild
        for d in _part_dirs(fs, p, index_dir, part_col):
            fs.delete(d, True)
        fs.delete(p(f"{index_dir}/{BUILDING_SENTINEL}"), False)
        return None
    if _part_dirs(fs, p, index_dir, part_col):
        raise ValueError(
            f"directory {index_dir} holds {part_col}= data but no layout "
            "marker and no recovery sentinel — refusing to rebuild over it "
            "(it may contain ingested documents a corpus rebuild would "
            "silently drop); restore the marker it was built with, or "
            "delete the directory to rebuild from the corpus"
        )
    return None


def build_index(
    spark: SparkSession,
    index_dir: str,
    marker_name: str,
    value: int,
    assign: DataFrame,
    part_col: str,
    n_parts: int,
    finalize=None,
) -> None:
    """Fresh build of the partitioned index table, crash-safe via the
    ``_building`` sentinel (see module docstring). ``finalize`` runs after
    the data lands and before the marker is stamped — the hook for
    artifacts that are PART of the index (the MaxSim ``_codebook``).
    Callers must have verified the dir is buildable via open_index."""
    from bert_etl_spark.functions.markers import write_int_marker

    write_int_marker(spark, f"{index_dir}/{BUILDING_SENTINEL}", value)
    (
        assign.repartition(n_parts, part_col)
        .write.partitionBy(part_col)
        .mode("append")  # dir verified empty of part dirs; append keeps
        .parquet(index_dir)  # the sentinel alive (overwrite wipes the dir)
    )
    if finalize is not None:
        finalize()
    write_int_marker(spark, f"{index_dir}/{marker_name}", value)
    fs, p = _fs(spark, index_dir)
    fs.delete(p(f"{index_dir}/{BUILDING_SENTINEL}"), False)


def ingest_rows(
    spark: SparkSession,
    index_dir: str,
    marker_name: str,
    expected: int,
    assigned: DataFrame,
    part_col: str,
    n_parts: int,
    key: str = "vec_id",
) -> int:
    """Idempotent append of pre-assigned rows into the standing index.

    Two dedup layers make at-least-once sources exactly-once at the sink:
    (1) WITHIN the batch, duplicate ``key`` rows collapse to one
    (re-delivered duplicates carry identical payloads, so which physical
    row survives is immaterial — round-10 advice, the 'medium' item);
    (2) ACROSS batches, an anti-join against the index's slim key column
    drops everything already present. Re-validates the layout marker
    immediately before the append (single-writer tripwire)."""
    from pyspark.sql import functions as F

    from bert_etl_spark.functions.markers import read_int_marker

    table_keys = (
        spark.read.option("basePath", index_dir).parquet(index_dir).select(key)
    )
    fresh = (
        assigned.dropDuplicates([key])
        .join(table_keys, key, "left_anti")
        .localCheckpoint(eager=True)
    )
    n = fresh.count()
    if n:
        marker = read_int_marker(spark, f"{index_dir}/{marker_name}")
        if marker != expected:
            raise ValueError(
                f"index at {index_dir} changed underneath this ingest "
                f"(marker now {marker}, expected {expected}) — a concurrent "
                "compact/rebuild violated the single-writer assumption; "
                "re-run the ingest against the settled index"
            )
        (
            fresh.repartition(n_parts, part_col)
            .write.partitionBy(part_col)
            .mode("append")
            .parquet(index_dir)
        )
    return n


def compact_index(
    spark: SparkSession,
    index_dir: str,
    marker_name: str,
    part_col: str,
    n_parts: int,
) -> int:
    """Compact a grown index (per-ingest appends leave one file per
    touched partition per batch) back to one file per partition,
    preserving the partition layout the probes prune on. Returns the
    compacted row count. Recoverable at every step once the
    ``_compact_pending`` sentinel lands — see the module docstring."""
    from bert_etl_spark.functions.markers import read_int_marker, write_int_marker

    marker_path = f"{index_dir}/{marker_name}"
    marker = read_int_marker(spark, marker_path)
    if marker is None:
        raise ValueError(
            f"no standing index at {index_dir} — nothing to compact"
        )
    table = spark.read.option("basePath", index_dir).parquet(index_dir)
    tmp = f"{index_dir}{TMP_SUFFIX}"
    (
        table.repartition(n_parts, part_col)
        .write.partitionBy(part_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    n_rows = spark.read.option("basePath", tmp).parquet(tmp).count()
    # COMMIT POINT: tmp is complete — from here a crash is recoverable
    write_int_marker(spark, f"{index_dir}/{PENDING_SENTINEL}", marker)
    fs, p = _fs(spark, index_dir)
    fs.delete(p(marker_path), False)  # readers now defer to the sentinel
    finish_compaction_swap(spark, index_dir, marker_name, part_col)
    return int(n_rows)


def pruned_scan(
    spark: SparkSession, index_dir: str, part_col: str, values: list[int]
):
    """Probe-side scan of the durable index restricted to ``values`` of the
    partition column: path-enumerate exactly the probed ``part=`` dirs (ONE
    FS glob — the ledger_probe idiom, so listing and scan are O(probed
    partitions), not O(index)) and keep the predicate as a real filter so
    it shows as PartitionFilters and a mis-enumerated path can never leak
    rows. Returns None when there is nothing to prune to (no values, or no
    matching dirs) — callers fall back to their unpruned table."""
    from pyspark.sql import functions as F

    if not values:
        return None
    fs, p = _fs(spark, index_dir)
    pat = "{" + ",".join(str(v) for v in sorted(set(values))) + "}"
    st = fs.globStatus(p(f"{index_dir}/{part_col}={pat}"))
    dirs = [] if st is None else [s.getPath().toString() for s in st]
    if not dirs:
        return None
    return (
        spark.read.option("basePath", index_dir)
        .parquet(*dirs)
        .filter(F.col(part_col).isin(values))
    )


def index_file_stats(
    spark: SparkSession, index_dir: str, part_col: str
) -> DataFrame:
    """Observability over a durable index: one row per partition dir with
    its file count and row count — the compaction trigger signal (compact
    when ``n_files`` grows past the ingest cadence you can tolerate; one
    file per partition is the compacted steady state). File counts come
    from one driver-side FS listing (O(partitions), the touched-bucket
    idiom); row counts from parquet footers of the same listing."""
    from pyspark.sql import functions as F

    fs, p = _fs(spark, index_dir)
    counts = {}
    for d in _part_dirs(fs, p, index_dir, part_col):
        n = 0
        for f in fs.listStatus(d):
            name = f.getPath().getName()
            if not name.startswith(("_", ".")):
                n += 1
        counts[d.getName().split("=", 1)[1]] = n
    rows = (
        spark.read.option("basePath", index_dir)
        .parquet(index_dir)
        .groupBy(F.col(part_col).cast("string").alias("part"))
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    data = [
        (r["part"], int(counts.get(r["part"], 0)), int(r["n_rows"]))
        for r in rows
    ]
    return spark.createDataFrame(
        data, schema=f"{part_col} string, n_files int, n_rows bigint"
    )
