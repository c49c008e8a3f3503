"""Driver-fidelity insurance: every registered query must run on a VANILLA
SparkSession (no get_spark confs) exactly as the driver invokes it.

Heavy (runs all queries end-to-end), so gated behind SPARK_GRAFT_VANILLA=1
— part of the round-end gate, not the default suite.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from bert_etl_spark.operators import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_VANILLA") != "1",
    reason="round-end gate only (SPARK_GRAFT_VANILLA=1)",
)


@pytest.fixture(scope="module")
def vanilla_spark():
    # deliberately NOT get_spark(): the driver builds its own plain session
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vanilla_contract")
        .getOrCreate()
    )
    yield spark


@pytest.mark.parametrize("name", sorted(registry.ALL_QUERIES))
def test_query_runs_on_vanilla_session(name, vanilla_spark):
    df = registry.ALL_QUERIES[name](vanilla_spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert df.schema.fieldNames()  # stable, non-empty schema
