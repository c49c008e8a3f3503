"""Catalog accessor and CLI entry tests."""

from __future__ import annotations

import subprocess
import sys

from bert_etl_spark.catalog import Catalog, load_tables


def test_catalog_lazy_access_and_views(spark, sf_small):
    cat = Catalog(spark, sf_small)
    assert cat.nation.count() == 25
    assert cat.region.count() == 5
    assert cat.table("nation") is cat.table("nation")  # cached handle
    tables = load_tables(spark, sf_small, names=("nation", "orders"))
    assert set(tables) == {"nation", "orders"}
    assert spark.sql("SELECT COUNT(*) AS n FROM nation").first().n == 25


def test_cli_list_and_unknown_query():
    # `list` imports the registry only — no JVM startup
    out = subprocess.run(
        [sys.executable, "-m", "bert_etl_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    assert "revenue_by_nation  [oracle]" in out.stdout
    # every registered entry is oracle-checked: the one rows-only entry
    # (xxhash64 simhash) was retired to library-only in round 7
    assert "[rows-only]" not in out.stdout

    bad = subprocess.run(
        [sys.executable, "-m", "bert_etl_spark", "run", "not_a_query"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert bad.returncode == 2
    assert "unknown query" in bad.stderr
