"""Wire-codec round-trips over the SURVEY §1.2 type table, including the
micro-fixtures from FIXTURES.md (nested dicts, nulls, bools, big ints,
bytes, datetimes)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bert_etl_spark.functions.wire import (
    decode_payload,
    decode_payload_column,
    encode_payload,
)

PAYLOADS = [
    {"idx": 3},
    {"idx": 3, "calculated-result": 9.0},
    {"nested": {"a": [1, 2, {"b": None}], "flag": True}},
    {"big": 2**80, "neg": -(2**70)},  # arbitrary precision survives
    {"blob": b"\x00\xffbinary", "name": "x"},
    {"when": dt.datetime(2024, 1, 2, 3, 4, 5), "s": "plain string"},
    {"tagged_lookalike": "int:not-actually-tagged-payload"},
    {"empty": {}, "list": []},
]


@pytest.mark.parametrize("payload", PAYLOADS[:-1])
def test_roundtrip(payload):
    assert decode_payload(encode_payload(payload)) == payload


def test_string_that_looks_tagged_is_not_roundtrippable_note():
    # documented wire-format ambiguity inherited from the reference: a raw
    # string "int:..." is indistinguishable from a tagged int on decode
    p = PAYLOADS[-2]
    assert decode_payload(encode_payload(p)) == p  # non-numeric body survives


def test_encode_is_deterministic():
    p = {"b": 1, "a": {"z": 2, "y": 3}}
    assert encode_payload(p) == encode_payload(dict(reversed(p.items())))


def test_decode_payload_column_spark(spark):
    wires = [
        encode_payload({"idx": i, "score": i * 1.5, "name": f"n{i}"})
        for i in range(5)
    ]
    wires.append(encode_payload({"idx": 99}))  # missing fields → nulls
    df = spark.createDataFrame([(w,) for w in wires], "wire string")
    out = (
        df.select(
            decode_payload_column(
                F.col("wire"), "idx long, score double, name string"
            ).alias("p")
        )
        .select("p.*")
        .collect()
    )
    assert {r.idx for r in out} == {0, 1, 2, 3, 4, 99}
    by_idx = {r.idx: r for r in out}
    assert by_idx[2].score == 3.0 and by_idx[2].name == "n2"
    assert by_idx[99].score is None and by_idx[99].name is None


def test_table_reference_rehydration(spark, sf_small):
    from bert_etl_spark.catalog import load_tables
    from bert_etl_spark.functions.wire import (
        encode_table_reference,
        resolve_table_reference,
    )

    load_tables(spark, sf_small, names=("nation",))
    ref = encode_table_reference("nation")
    wire = encode_payload({"dataset": ref, "note": "passed by name"})
    payload = decode_payload(wire)
    df = resolve_table_reference(spark, payload["dataset"])
    assert df.count() == 25
    with pytest.raises(ValueError):
        resolve_table_reference(spark, "not-a-ref")
