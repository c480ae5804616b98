"""PLAIN codec — passthrough fallback, always applicable.

Fixed-width: the raw little-endian buffer of the NumPy array.
Var-width:   FOR-bitpacked lengths followed by the concatenated data bytes
(equivalent information to the Arrow offsets buffer, but lengths pack far
smaller than absolute offsets).

This is the codec-layer floor: the selector guarantees every column is at
worst PLAIN, mirroring Parquet's PLAIN encoding fallback that the reference
relies on implicitly (reference: RecordWriter.java:32 enables dictionary
encoding, parquet falls back to plain when the dictionary overflows).
"""

from __future__ import annotations

import numpy as np

from .base import pack_lengths, offsets_from_lengths, unpack_lengths


def encode_plain_fixed(vals: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(vals)
    return v.tobytes(), {"dtype": v.dtype.str}


def decode_plain_fixed(payload: bytes, meta: dict, n: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.dtype(meta["dtype"]), count=n)


def encode_plain_var(data, offsets: np.ndarray) -> tuple[list, dict]:
    """Payload is a piece list [packed_lengths, data] — the data piece may
    be a zero-copy memoryview of the Arrow buffer (PLAIN never copies the
    payload; the chunk writer streams it)."""
    lengths = np.diff(offsets.astype(np.int64))
    lp, lmeta = pack_lengths(lengths)
    return [lp, data], {**lmeta, "lpn": len(lp)}


def decode_plain_var(payload: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    lpn = meta["lpn"]
    lengths = unpack_lengths(payload[:lpn], meta)
    return payload[lpn:], offsets_from_lengths(lengths)
