"""Dictionary codec — sorted-unique dictionary + bit-packed codes.

The direct from-scratch replacement for the reference's
``withDictionaryEncoding(true)`` (reference: RecordWriter.java:32), but
per-column-chunk and explicit: the dictionary is the *sorted* distinct
values (sorting makes code assignment deterministic across runs — required
for resumable manifests, SURVEY.md §7.4), codes are bit-packed at
``ceil(log2(cardinality))`` bits.

Wins on low/medium-cardinality columns (``lang``, hosts); the selector
rejects it automatically when cardinality ≈ n (all-distinct urls).
"""

from __future__ import annotations

import numpy as np

from .base import (bit_width, bitpack, bitunpack, offsets_from_lengths,
                   pack_lengths, unpack_lengths, varbytes_to_objects)


def encode_dict_fixed(vals: np.ndarray) -> tuple[bytes, dict]:
    uniq, codes = np.unique(np.ascontiguousarray(vals), return_inverse=True)
    width = bit_width(max(len(uniq) - 1, 0))
    payload = uniq.tobytes() + bitpack(codes.astype(np.uint64), width)
    return payload, {"card": int(len(uniq)), "width": width,
                     "dtype": uniq.dtype.str}


def decode_dict_fixed(payload: bytes, meta: dict, n: int) -> np.ndarray:
    dt = np.dtype(meta["dtype"])
    card = meta["card"]
    uniq = np.frombuffer(payload[:card * dt.itemsize], dtype=dt)
    codes = bitunpack(payload[card * dt.itemsize:], n, meta["width"]).astype(np.int64)
    return uniq[codes]


def encode_dict_var(data: bytes, offsets: np.ndarray) -> tuple[bytes, dict]:
    objs = varbytes_to_objects(data, offsets)
    uniq, codes = np.unique(objs, return_inverse=True)
    width = bit_width(max(len(uniq) - 1, 0))
    dict_data = b"".join(uniq)
    dict_lens = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                            count=len(uniq))
    lp, lmeta = pack_lengths(dict_lens)
    payload = lp + dict_data + bitpack(codes.astype(np.uint64), width)
    return payload, {**lmeta, "lpn": len(lp), "dn": len(dict_data),
                     "card": int(len(uniq)), "width": width}


def decode_dict_var(payload: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    lpn, dn = meta["lpn"], meta["dn"]
    dict_lens = unpack_lengths(payload[:lpn], meta)
    dict_offs = offsets_from_lengths(dict_lens)
    dict_data = payload[lpn:lpn + dn]
    codes = bitunpack(payload[lpn + dn:], n, meta["width"]).astype(np.int64)
    out_lens = dict_lens[codes]
    out_offs = offsets_from_lengths(out_lens)
    # vectorized gather of variable-width slices: index-expand per code
    total = int(out_lens.sum())
    src = np.frombuffer(dict_data, dtype=np.uint8)
    if total:
        # absolute source index for every output byte
        starts = dict_offs[codes]                       # (n,)
        idx = np.repeat(starts, out_lens) + _ramp(out_lens)
        out = src[idx].tobytes()
    else:
        out = b""
    return out, out_offs


def _ramp(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — vectorized intra-run counters."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    out = np.arange(total, dtype=np.int64)
    run_starts = np.repeat(ends - lengths, lengths)
    return out - run_starts
