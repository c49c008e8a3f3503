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


# ---------------------------------------------------------------------------
# numpy scalar wire tags (SURVEY §1.2; reference numpy.py:53-115/:145-203)
# ---------------------------------------------------------------------------

import base64

import numpy as np

from bert_etl_spark.functions.codecs import decode_complex64
from bert_etl_spark.functions.wire import NP_SCALAR_DTYPES, decode_value, encode_value

_SAMPLES = {
    "float16": np.float16(1.5),
    "float32": np.float32(-2.25),
    "float64": np.float64(3.141592653589793),
    "complex64": np.complex64(1.5 - 2.5j),
    "int8": np.int8(-128),
    "int16": np.int16(-32768),
    "int32": np.int32(-(2**31)),
    "int64": np.int64(-(2**63)),
    "uint8": np.uint8(255),
    "uint16": np.uint16(65535),
    "uint32": np.uint32(2**32 - 1),
    "uint64": np.uint64(2**64 - 1),
    "bool_": np.bool_(True),
}


@pytest.mark.parametrize("name", sorted(NP_SCALAR_DTYPES))
def test_np_scalar_roundtrip(name):
    val = _SAMPLES[name]
    av = encode_value(val)
    assert av["S"].startswith(f"np.{name}:")
    back = decode_value(av)
    assert type(back) is type(val)
    assert back == val or (np.isnan(val) and np.isnan(back))


def test_np_scalar_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.sampled_from(sorted(set(NP_SCALAR_DTYPES) - {"bool_", "complex64"})),
        st.integers(min_value=-(2**63), max_value=2**64 - 1),
    )
    def run(name, seed):
        dtype = np.dtype(name)
        if dtype.kind in "iu":
            info = np.iinfo(dtype)
            val = dtype.type(info.min + seed % (int(info.max) - int(info.min) + 1))
        else:
            val = dtype.type(seed / 7.0)  # exercises rounding per width
        back = decode_value(encode_value(val))
        assert back.dtype == dtype
        assert back == val

    run()


def test_np_scalar_inside_payload():
    p = {"vec_norm": np.float32(0.5), "n": np.int16(12), "ok": np.bool_(False)}
    back = decode_payload(encode_payload(p))
    assert back["vec_norm"] == np.float32(0.5)
    assert back["n"] == 12 and back["n"].dtype == np.dtype("int16")
    assert back["ok"] == np.False_ and type(back["ok"]) is np.bool_


def test_np_intc_intp_encode_under_concrete_dtype():
    # platform aliases encode under their concrete width…
    assert encode_value(np.intc(7))["S"].startswith("np.int32:")
    assert encode_value(np.intp(7))["S"].startswith("np.int64:")
    # …and reference-written alias tags (incl. the 'incp' typo) still decode
    b = base64.b64encode(np.int64(9).tobytes()).decode()
    for tag in ("intp", "incp"):
        assert decode_value({"S": f"np.{tag}:{b}"}) == 9


def test_np_ndarray_inside_payload():
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    back = decode_payload(encode_payload({"m": arr}))
    np.testing.assert_array_equal(back["m"], arr)


def test_np_lookalike_string_survives():
    # a raw string that merely looks tagged decodes back to itself
    assert decode_value({"S": "np.float32:not-base64!!"}) == "np.float32:not-base64!!"
    assert decode_value({"S": "np.unknown:AAAA"}) == "np.unknown:AAAA"


def test_complex64_struct_column(spark):
    wire = encode_value(np.complex64(3.0 - 4.0j))["S"]
    df = spark.createDataFrame([(wire,), (None,)], "w string")
    rows = df.select(decode_complex64("w").alias("z")).select("z.*").collect()
    assert rows[0].re == 3.0 and rows[0].im == -4.0
    assert rows[1].re is None and rows[1].im is None
