"""np.ndarray wire-codec parity (SURVEY §1.2, §4.3.2).

The reference serializes numpy arrays as
``np.ndarray:<shape>:<dtype>:<b64-fortran-bytes>`` inside queue payloads
(/root/reference bert/encoders/numpy.py:117-122 encode, :205-232 decode).
This module round-trips that format to/from native Spark ``array<double>``
columns so legacy payloads can be ingested once and then live as columnar
arrays (the fast path everywhere else in this engine).

Known reference codec bugs intentionally NOT reproduced (SURVEY §1.2):
- uint16 decoded with dtype=uint8 (numpy.py:184-186)
- dtype map typo 'unit32' (numpy.py:219)
- decode slicing `datum[11:]` on the wrong variable (numpy.py:205-206)

Pandas UDFs (Arrow-batched) — this is ingest-boundary code, not hot-path.
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

PREFIX = "np.ndarray"


def encode_ndarray_value(arr: np.ndarray) -> str:
    """Reference wire format: np.ndarray:<shape>:<dtype>:<b64> (Fortran order)."""
    shape = ",".join(str(s) for s in arr.shape)
    payload = base64.b64encode(arr.tobytes(order="F")).decode("ascii")
    return f"{PREFIX}:{shape}:{arr.dtype.name}:{payload}"


def decode_ndarray_value(s: str) -> np.ndarray:
    prefix, shape, dtype, payload = s.split(":", 3)
    if prefix != PREFIX:
        raise ValueError(f"not an ndarray payload: {s[:30]}")
    shp = tuple(int(x) for x in shape.split(",") if x)
    raw = base64.b64decode(payload)
    return np.frombuffer(raw, dtype=np.dtype(dtype)).reshape(shp, order="F")


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def decode_ndarray(col: pd.Series) -> pd.Series:
    """Wire string → array<double> (rank-1; higher ranks flatten F-order)."""
    return col.map(
        lambda s: None if s is None else decode_ndarray_value(s).ravel(order="F").astype(float).tolist()
    )


@F.pandas_udf(T.StringType())
def encode_ndarray(col: pd.Series) -> pd.Series:
    """array<double> → wire string (float64, rank-1)."""
    return col.map(
        lambda v: None if v is None else encode_ndarray_value(np.asarray(v, dtype=np.float64))
    )


COMPLEX64_SCHEMA = T.StructType(
    [
        T.StructField("re", T.FloatType()),
        T.StructField("im", T.FloatType()),
    ]
)


@F.pandas_udf(COMPLEX64_SCHEMA)
def decode_complex64(col: pd.Series) -> pd.DataFrame:
    """'np.complex64:<b64>' wire string → struct<re: float, im: float>.

    Spark has no complex type; SURVEY §1.2 maps complex64 to a two-float
    struct. (The reference's own decoder never matches this tag — its
    13-char prefix is compared against a 12-char slice,
    /root/reference bert/encoders/numpy.py:159-161 — documented, not
    reproduced.)
    """
    import base64 as _b64

    res, ims = [], []
    for s in col:
        if s is None or not s.startswith("np.complex64:"):
            res.append(None)
            ims.append(None)
            continue
        z = np.frombuffer(
            _b64.b64decode(s[len("np.complex64:"):]),
            dtype=np.dtype(np.complex64).newbyteorder("<"),
        )[0]
        res.append(np.float32(z.real))
        ims.append(np.float32(z.imag))
    return pd.DataFrame({"re": res, "im": ims})
