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
import pyarrow as pa
import pyarrow.compute as pc

from .base import (bit_width, bitpack, bitunpack, offsets_from_lengths,
                   pack_lengths, unpack_lengths)


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


def _arrow_var(data, offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary view over a (data, offsets) pair."""
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(offs), pa.py_buffer(data)])


def encode_dict_var(data: bytes, offsets: np.ndarray) -> tuple[bytes, dict]:
    """Sorted-unique dictionary over a var-width buffer, fully vectorized.

    The round-1/2 implementation materialised one Python ``bytes`` object
    per ROW (``varbytes_to_objects`` + object-array ``np.unique``) — the
    last per-row Python on the encode hot path.  Now: Arrow
    ``dictionary_encode`` finds distincts in C++ (first-occurrence order),
    ``sort_indices`` orders the dictionary lexicographically (identical to
    Python ``bytes`` ordering — both compare byte-wise, shorter prefix
    first), and a rank permutation remaps the codes.  Payload bytes are
    unchanged from the object-path version (pinned by pytest).
    """
    n = len(offsets) - 1
    if n == 0:
        lp, lmeta = pack_lengths(np.empty(0, dtype=np.int64))
        return lp, {**lmeta, "lpn": len(lp), "dn": 0, "card": 0, "width": 0}
    denc = _arrow_var(data, offsets).dictionary_encode()
    dvals = denc.dictionary
    card = len(dvals)
    order = pc.sort_indices(dvals).to_numpy().astype(np.int64)
    rank = np.empty(card, dtype=np.int64)
    rank[order] = np.arange(card, dtype=np.int64)
    codes = rank[denc.indices.to_numpy(zero_copy_only=False)]
    sorted_dict = dvals.take(pa.array(order))
    dbufs = sorted_dict.buffers()
    # dictionary_encode(large_binary) yields a large_binary dictionary
    # (int64 offsets); plain binary/string would be int32 — handle both
    osz = 8 if (pa.types.is_large_binary(sorted_dict.type)
                or pa.types.is_large_string(sorted_dict.type)) else 4
    doffs = np.frombuffer(dbufs[1], dtype=f"<i{osz}", count=card + 1,
                          offset=sorted_dict.offset * osz).astype(np.int64)
    dict_lens = np.diff(doffs)
    dict_data = bytes(memoryview(dbufs[2])[int(doffs[0]):int(doffs[-1])]) \
        if dbufs[2] is not None else b""
    width = bit_width(max(card - 1, 0))
    lp, lmeta = pack_lengths(dict_lens)
    payload = lp + dict_data + bitpack(codes.astype(np.uint64), width)
    return payload, {**lmeta, "lpn": len(lp), "dn": len(dict_data),
                     "card": int(card), "width": width}


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
