"""Queue wire-format codec — reference parity for §2A#32/33 (SURVEY §1.2).

The reference serializes queue payloads in the DynamoDB AttributeValue shape
with scalar tagging inside strings (/root/reference bert/encoders/base.py):

    dict   → {'M': {k: enc(v)}}          bytes → {'B': b64}
    list   → {'L': [enc(v), …]}          str   → {'S': raw}
    bool   → {'S': 'bool:True'}          int   → {'S': 'int:42'}
    float  → {'S': 'float:1.5'}          None  → {'S': 'null:'}
    datetime → {'S': '%Y-%m-%dT%H:%M:%SZ'} (identity-encoding path)
    np scalar → {'S': 'np.<dtype>:<b64 little-endian bytes>'}
      (/root/reference bert/encoders/numpy.py:53-115 encode, :145-203 decode)
    np.ndarray → {'S': 'np.ndarray:<shape>:<dtype>:<b64>'} (functions/codecs.py)

Re-implemented from the SURVEY description (not copied). Used at the ingest
boundary: decode legacy payload JSON once → typed columns; everything
downstream is columnar. Arbitrary-precision ints are preserved as Python
ints in the codec; columnar mapping documents the LongType overflow
divergence (SURVEY §1.2).

Reference numpy-decode bugs documented and intentionally NOT reproduced
(each makes a tag the reference itself ENCODES fail to decode there):
- 'np.int32'/'np.int64' prefixes matched against a 9-char slice that always
  includes the ':' (numpy.py:172-178) → reference never decodes its own
  int32/int64 scalars;
- 'np.complex64:' (13 chars) matched with a 12-char slice (numpy.py:159-161)
  → complex64 never decodes;
- uint16 payloads decoded with dtype=uint8 (numpy.py:184-186) → wrong values;
- np.intp ENCODED under the typo tag 'np.incp' (numpy.py:110-112) while
  decode expects 'np.intp' → intp never round-trips;
- np.bool_ is encoded ('np.bool_:') but has no decode branch at all.
This codec decodes all of those tags correctly, including the 'np.incp'
alias so payloads written by the reference still rehydrate.

Columnar mapping for complex64 (SURVEY §1.2): Spark has no complex type —
``functions/codecs.py.decode_complex64_column`` lands it as
``struct<re: float, im: float>``.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
from typing import Any

import numpy as np
import pandas as pd

DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%SZ"

# numpy scalar dtypes with a wire tag (SURVEY §1.2). intc/intp are platform
# aliases — they encode under their concrete dtype name (int32/int64 here),
# which the reference's own decoder would accept for intc and (modulo its
# 'incp' typo) intp.
NP_SCALAR_DTYPES = (
    "float16", "float32", "float64",
    "complex64",
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "bool_",
)
# decode-side aliases: reference-written payloads may carry these tags
_NP_TAG_ALIASES = {"bool": "bool_", "intc": "int32", "intp": "int64", "incp": "int64"}


def _np_dtype_name(value: np.generic) -> str:
    name = value.dtype.name  # 'bool' for np.bool_, else the dtype name
    return "bool_" if name == "bool" else name


def encode_value(value: Any) -> dict:
    """Python value → AttributeValue-shaped dict."""
    if isinstance(value, dict):
        return {"M": {k: encode_value(v) for k, v in value.items()}}
    if isinstance(value, (list, tuple)):
        return {"L": [encode_value(v) for v in value]}
    if isinstance(value, bytes):
        return {"B": base64.b64encode(value).decode("ascii")}
    # numpy checks precede the Python-scalar ones: np.float64 IS a float
    # subclass (and np.bool_ would otherwise stringify wrong)
    if isinstance(value, np.ndarray):
        from bert_etl_spark.functions.codecs import encode_ndarray_value

        return {"S": encode_ndarray_value(value)}
    if isinstance(value, np.generic):
        name = _np_dtype_name(value)
        if name not in NP_SCALAR_DTYPES:
            raise TypeError(f"unencodable numpy dtype: {value.dtype}")
        # fixed little-endian byte order: the wire format must not depend
        # on producer endianness
        payload = value.astype(value.dtype.newbyteorder("<")).tobytes()
        return {"S": f"np.{name}:{base64.b64encode(payload).decode('ascii')}"}
    if isinstance(value, bool):  # before int — bool is an int subclass
        return {"S": f"bool:{value}"}
    if isinstance(value, int):
        return {"S": f"int:{value}"}
    if isinstance(value, float):
        return {"S": f"float:{value!r}"}
    if value is None:
        return {"S": "null:"}
    if isinstance(value, dt.datetime):
        return {"S": value.strftime(DATETIME_FORMAT)}
    if isinstance(value, str):
        return {"S": value}
    raise TypeError(f"unencodable type: {type(value).__name__}")


def decode_value(av: dict) -> Any:
    """AttributeValue-shaped dict → Python value."""
    if "M" in av:
        return {k: decode_value(v) for k, v in av["M"].items()}
    if "L" in av:
        return [decode_value(v) for v in av["L"]]
    if "B" in av:
        return base64.b64decode(av["B"])
    s = av["S"]
    if s.startswith("np."):
        tag, _, payload = s[3:].partition(":")
        if tag == "ndarray":
            from bert_etl_spark.functions.codecs import decode_ndarray_value

            return decode_ndarray_value(s)
        name = _NP_TAG_ALIASES.get(tag, tag)
        if name in NP_SCALAR_DTYPES:
            try:
                raw = base64.b64decode(payload, validate=True)
                dtype = np.dtype("bool" if name == "bool_" else name).newbyteorder("<")
                return np.frombuffer(raw, dtype=dtype)[0]
            except Exception:
                return s  # raw string that merely looks tagged
        return s
    if s.startswith("bool:"):
        return s[5:] == "True"
    if s.startswith("int:"):
        try:
            return int(s[4:])
        except ValueError:  # raw string that merely looks tagged
            return s
    if s.startswith("float:"):
        try:
            return float(s[6:])
        except ValueError:
            return s
    if s == "null:":
        return None
    try:  # identity-encoded datetimes are bare strings in the wire format
        return dt.datetime.strptime(s, DATETIME_FORMAT)
    except ValueError:
        return s


def encode_payload(payload: dict) -> str:
    """Queue item payload dict → wire JSON string (one queue item)."""
    return json.dumps(encode_value(payload), sort_keys=True)


def decode_payload(wire: str) -> dict:
    return decode_value(json.loads(wire))


TABLE_REF_PREFIX = "table:"


def encode_table_reference(name: str) -> str:
    """Dataset-by-name reference — ETLReference parity (/root/reference
    bert/etl/__init__.py:239-259): datasets travel through payloads as
    names, not data."""
    return f"{TABLE_REF_PREFIX}{name}"


def resolve_table_reference(spark, ref: str):
    """Rehydrate a reference into a DataFrame via the session catalog —
    the class-path-signature rehydration of the reference
    (bert/encoders/datatypes.py:61-81) becomes a catalog lookup."""
    if not ref.startswith(TABLE_REF_PREFIX):
        raise ValueError(f"not a table reference: {ref!r}")
    return spark.table(ref[len(TABLE_REF_PREFIX):])


def decode_payload_column(col, target_schema: str):
    """Wire-JSON column → struct column of ``target_schema``.

    Two stages: an Arrow-batched pandas UDF untags the wire format into
    canonical JSON, then the JVM-side ``from_json`` types it. Fields absent
    from a payload come back null; extra payload fields are dropped — the
    permissive-schema stance of the reference made explicit. Binary fields
    are not JSON-representable here; keep blobs in their own column
    (functions/codecs.py handles the ndarray wire strings).
    """
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _untag(wires: pd.Series) -> pd.Series:
        def one(wire):
            if wire is None:
                return None
            payload = decode_payload(wire)
            return _json.dumps(payload, default=str)

        return wires.map(one)

    return F.from_json(_untag(col), target_schema)
