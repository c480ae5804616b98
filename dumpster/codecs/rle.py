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
                   pack_lengths, unpack_lengths, varbytes_to_objects)


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


def encode_rle_var(data: bytes, offsets: np.ndarray) -> tuple[bytes, dict]:
    objs = varbytes_to_objects(data, offsets)
    n = len(objs)
    if n == 0:
        return b"", {"runs": 0, "rb": 0, "rw": 0, "rpn": 0,
                     "lpn": 0, "ln": 0, "lb": 0, "lw": 0}
    starts, run_lens = _run_bounds(n, objs[1:] != objs[:-1])
    rp, rb, rw = for_pack_u64(run_lens.astype(np.uint64))
    run_vals = objs[starts]
    val_lens = np.fromiter((len(o) for o in run_vals), dtype=np.int64,
                           count=len(run_vals))
    lp, lmeta = pack_lengths(val_lens)
    payload = rp + lp + b"".join(run_vals)
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
