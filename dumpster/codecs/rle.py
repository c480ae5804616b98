"""Run-length encoding — (value, run_length) pairs in row order.

Targets low-cardinality columns with locality: the ``lang`` column of a
host-major-ordered crawl forms long runs (FIXTURES.md F1), exactly the case
the north_rule names ("RLE for low-cardinality language codes").  Run
boundaries are found vectorized (``values[1:] != values[:-1]``); run
lengths FOR-bitpack; run values reuse the PLAIN var/fixed serialisation.

Because the engine sorts partitions by the salted bucket (host-major), RLE
gets its locality from the pipeline, not by luck — see
pipeline.salted_bucket.
"""

from __future__ import annotations

import numpy as np

from .base import (for_pack_u64, for_unpack_u64, offsets_from_lengths,
                   pack_lengths, unpack_lengths)


def _run_bounds(n: int, change_mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """starts + run lengths from a boolean mask of positions i where
    value[i] != value[i-1] (mask has length n-1)."""
    starts = np.concatenate(([0], np.flatnonzero(change_mask) + 1))
    run_lens = np.diff(np.concatenate((starts, [n])))
    return starts, run_lens


def encode_rle_fixed(vals: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(vals)
    n = len(v)
    if n == 0:
        return b"", {"runs": 0, "rb": 0, "rw": 0, "dtype": v.dtype.str, "rpn": 0}
    starts, run_lens = _run_bounds(n, v[1:] != v[:-1])
    rp, rb, rw = for_pack_u64(run_lens.astype(np.uint64))
    payload = rp + v[starts].tobytes()
    return payload, {"runs": int(len(starts)), "rb": rb, "rw": rw,
                     "dtype": v.dtype.str, "rpn": len(rp)}


def decode_rle_fixed(payload: bytes, meta: dict, n: int) -> np.ndarray:
    runs, rpn = meta["runs"], meta["rpn"]
    if runs == 0:
        return np.empty(0, dtype=np.dtype(meta["dtype"]))
    run_lens = for_unpack_u64(payload[:rpn], runs, meta["rb"], meta["rw"]).astype(np.int64)
    run_vals = np.frombuffer(payload[rpn:], dtype=np.dtype(meta["dtype"]), count=runs)
    return np.repeat(run_vals, run_lens)


def _change_mask_var(data, offsets: np.ndarray) -> np.ndarray:
    """Boolean mask[i-1] = row i differs from row i-1, without per-row
    Python objects: unequal lengths differ trivially; equal-length
    adjacent pairs are byte-compared via one vectorized gather + a
    segment-ANY reduceat over the mismatch bits."""
    offs = offsets.astype(np.int64, copy=False)
    lens = np.diff(offs)
    n = len(lens)
    if n <= 1:
        return np.zeros(0, dtype=bool)
    changed = lens[1:] != lens[:-1]
    cand = np.flatnonzero(~changed) + 1          # rows w/ same len as prev
    cand = cand[lens[cand] > 0]                  # empty==empty: unchanged
    if len(cand):
        L = lens[cand]
        total = int(L.sum())
        src = np.frombuffer(data, dtype=np.uint8)
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(L) - L, L)
        idx_cur = np.repeat(offs[cand], L) + ramp
        idx_prev = np.repeat(offs[cand - 1], L) + ramp
        neq = src[idx_cur] != src[idx_prev]
        bounds = np.concatenate(([0], np.cumsum(L)[:-1]))
        changed[cand - 1] = np.add.reduceat(neq, bounds) > 0
    return changed


def encode_rle_var(data: bytes, offsets: np.ndarray) -> tuple[bytes, dict]:
    n = len(offsets) - 1
    if n == 0:
        return b"", {"runs": 0, "rb": 0, "rw": 0, "rpn": 0,
                     "lpn": 0, "ln": 0, "lb": 0, "lw": 0}
    offs = offsets.astype(np.int64, copy=False)
    starts, run_lens = _run_bounds(n, _change_mask_var(data, offs))
    rp, rb, rw = for_pack_u64(run_lens.astype(np.uint64))
    val_lens = offs[starts + 1] - offs[starts]
    lp, lmeta = pack_lengths(val_lens)
    # gather the first row of each run from the source buffer, vectorized
    total = int(val_lens.sum())
    if total:
        src = np.frombuffer(data, dtype=np.uint8)
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(val_lens) - val_lens, val_lens)
        vals_data = src[np.repeat(offs[starts], val_lens) + ramp].tobytes()
    else:
        vals_data = b""
    payload = rp + lp + vals_data
    return payload, {"runs": int(len(starts)), "rb": rb, "rw": rw,
                     "rpn": len(rp), "lpn": len(lp), **lmeta}


def decode_rle_var(payload: bytes, meta: dict, n: int) -> tuple[bytes, np.ndarray]:
    runs, rpn, lpn = meta["runs"], meta["rpn"], meta["lpn"]
    if runs == 0:
        return b"", np.zeros(1, dtype=np.int64)
    run_lens = for_unpack_u64(payload[:rpn], runs, meta["rb"], meta["rw"]).astype(np.int64)
    val_lens = unpack_lengths(payload[rpn:rpn + lpn], meta)
    val_offs = offsets_from_lengths(val_lens)
    vdata = payload[rpn + lpn:]
    out_lens = np.repeat(val_lens, run_lens)
    out_offs = offsets_from_lengths(out_lens)
    src = np.frombuffer(vdata, dtype=np.uint8)
    total = int(out_lens.sum())
    if total == 0:
        return b"", out_offs
    run_ids = np.repeat(np.arange(runs, dtype=np.int64), run_lens)
    starts = val_offs[run_ids]
    ramp = np.arange(total, dtype=np.int64) - np.repeat(
        out_offs[:-1], out_lens)
    idx = np.repeat(starts, out_lens) + ramp
    return src[idx].tobytes(), out_offs
