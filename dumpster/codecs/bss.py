"""Byte-stream split — transpose values into per-byte planes.

The analog of Parquet's BYTE_STREAM_SPLIT encoding (added for float
columns in parquet-format 2.8; the reference's parquet-avro 1.10.0
predates it — this engine brings the technique to its replacement sink).
The transform itself is size-neutral: the win appears after the general
byte-level stage (zlib here, Snappy in Parquet), because grouping the
exponent/high bytes of IEEE-754 floats — or the near-constant high bytes
of small-range ints — into contiguous planes gives the compressor long
runs it cannot see in interleaved little-endian values.  Embedding
vectors (`array<float>` flattened to the child array by the chunk layer)
are the primary target.

Selection: the selector's size estimates are zlib-aware (selector.py), so
BSS is picked exactly when transpose+zlib beats the other codecs' final
stored size — never by construction.
"""

from __future__ import annotations

import numpy as np


def encode_bss_fixed(vals: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(vals)
    n = len(v)
    meta = {"dtype": v.dtype.str}
    if n == 0:
        return b"", meta
    planes = v.view(np.uint8).reshape(n, v.dtype.itemsize).T
    return np.ascontiguousarray(planes).tobytes(), meta


def decode_bss_fixed(payload: bytes, meta: dict, n: int) -> np.ndarray:
    dt = np.dtype(meta["dtype"])
    if n == 0:
        return np.empty(0, dtype=dt)
    planes = np.frombuffer(payload, dtype=np.uint8,
                           count=n * dt.itemsize).reshape(dt.itemsize, n)
    return np.ascontiguousarray(planes.T).view(dt).ravel()
