"""Queue wire-format codec — reference parity for §2A#32/33 (SURVEY §1.2).

The reference serializes queue payloads in the DynamoDB AttributeValue shape
with scalar tagging inside strings (/root/reference bert/encoders/base.py):

    dict   → {'M': {k: enc(v)}}          bytes → {'B': b64}
    list   → {'L': [enc(v), …]}          str   → {'S': raw}
    bool   → {'S': 'bool:True'}          int   → {'S': 'int:42'}
    float  → {'S': 'float:1.5'}          None  → {'S': 'null:'}
    datetime → {'S': '%Y-%m-%dT%H:%M:%SZ'} (identity-encoding path)
    np.ndarray → {'S': 'np.ndarray:…'}   (functions/codecs.py)

Re-implemented from the SURVEY description (not copied). Used at the ingest
boundary: decode legacy payload JSON once → typed columns; everything
downstream is columnar. Arbitrary-precision ints are preserved as Python
ints in the codec; columnar mapping documents the LongType overflow
divergence (SURVEY §1.2).
"""

from __future__ import annotations

import base64
import datetime as dt
import json
from typing import Any

import pandas as pd

DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%SZ"


def encode_value(value: Any) -> dict:
    """Python value → AttributeValue-shaped dict."""
    if isinstance(value, dict):
        return {"M": {k: encode_value(v) for k, v in value.items()}}
    if isinstance(value, (list, tuple)):
        return {"L": [encode_value(v) for v in value]}
    if isinstance(value, bytes):
        return {"B": base64.b64encode(value).decode("ascii")}
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
