"""Byte-identity pins for the round-3 vectorized var-width codecs.

encode_dict_var / encode_rle_var were rewritten without per-row Python
(VERDICT r2 item 2: the object loop in varbytes_to_objects + object-array
np.unique was the last per-row Python on the encode hot path).  The on-disk
payload must not change: these tests re-implement the round-2 object-path
encoders verbatim and assert payload + meta equality on adversarial
fixtures, then round-trip through the unchanged decoders.
"""

import numpy as np
import pytest

from dumpster.codecs import base
from dumpster.codecs.base import (bit_width, bitpack, offsets_from_lengths,
                                  pack_lengths, varbytes_to_objects)
from dumpster.codecs.dictionary import decode_dict_var, encode_dict_var
from dumpster.codecs.rle import decode_rle_var, encode_rle_var
from dumpster.codecs.base import for_pack_u64


def _old_encode_dict_var(data, offsets):
    objs = varbytes_to_objects(bytes(data), offsets)
    uniq, codes = np.unique(objs, return_inverse=True)
    width = bit_width(max(len(uniq) - 1, 0))
    dict_data = b"".join(uniq)
    dict_lens = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                            count=len(uniq))
    lp, lmeta = pack_lengths(dict_lens)
    payload = lp + dict_data + bitpack(codes.astype(np.uint64), width)
    return payload, {**lmeta, "lpn": len(lp), "dn": len(dict_data),
                     "card": int(len(uniq)), "width": width}


def _old_encode_rle_var(data, offsets):
    objs = varbytes_to_objects(bytes(data), offsets)
    n = len(objs)
    if n == 0:
        return b"", {"runs": 0, "rb": 0, "rw": 0, "rpn": 0,
                     "lpn": 0, "ln": 0, "lb": 0, "lw": 0}
    change = objs[1:] != objs[:-1]
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    run_lens = np.diff(np.concatenate((starts, [n])))
    rp, rb, rw = for_pack_u64(run_lens.astype(np.uint64))
    run_vals = objs[starts]
    val_lens = np.fromiter((len(o) for o in run_vals), dtype=np.int64,
                           count=len(run_vals))
    lp, lmeta = pack_lengths(val_lens)
    payload = rp + lp + b"".join(run_vals)
    return payload, {"runs": int(len(starts)), "rb": rb, "rw": rw,
                     "rpn": len(rp), "lpn": len(lp), **lmeta}


def _mk(rows):
    data = b"".join(rows)
    offs = offsets_from_lengths(np.array([len(r) for r in rows],
                                         dtype=np.int64))
    return data, offs


FIXTURES = [
    [],                                            # empty
    [b""],                                         # single empty
    [b"", b"", b""],                               # all empty
    [b"a"],                                        # single
    [b"a", b"a", b"a", b"b", b"b", b"a"],          # runs
    [b"ab", b"a", b"abc", b"", b"ab"],             # prefix ordering matters
    [b"en", b"en", b"pt", b"pt", b"pt", b"es", b"en", b""] * 7,
    [bytes([i % 7, (i * 3) % 11]) for i in range(257)],  # card > 64
    [b"\x00", b"\x00\x00", b"\xff", b"\xff\xfe", b"\xfe\xff"],
    [b"same"] * 100,                               # one run, card 1
]


@pytest.mark.parametrize("rows", FIXTURES, ids=range(len(FIXTURES)))
def test_dict_var_payload_pinned(rows):
    data, offs = _mk(rows)
    old_p, old_m = _old_encode_dict_var(data, offs)
    new_p, new_m = encode_dict_var(data, offs)
    assert new_p == old_p
    assert new_m == old_m
    out_data, out_offs = decode_dict_var(new_p, new_m, len(rows))
    assert out_data == data and list(out_offs) == list(offs)


@pytest.mark.parametrize("rows", FIXTURES, ids=range(len(FIXTURES)))
def test_rle_var_payload_pinned(rows):
    data, offs = _mk(rows)
    old_p, old_m = _old_encode_rle_var(data, offs)
    new_p, new_m = encode_rle_var(data, offs)
    assert new_p == old_p
    assert new_m == old_m
    if rows:
        out_data, out_offs = decode_rle_var(new_p, new_m, len(rows))
        assert out_data == data and list(out_offs) == list(offs)


def test_fuzz_payload_pinned():
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(0, 400))
        vocab = [bytes(rng.integers(0, 256, size=int(rng.integers(0, 12)),
                                    dtype=np.uint8).tobytes())
                 for _ in range(max(1, int(rng.integers(1, 30))))]
        rows = [vocab[int(i)] for i in rng.integers(0, len(vocab), size=n)]
        # run-bias half the trials so RLE sees real runs
        if trial % 2:
            rows = sorted(rows)
        data, offs = _mk(rows)
        assert encode_dict_var(data, offs) == _old_encode_dict_var(data, offs)
        assert encode_rle_var(data, offs) == _old_encode_rle_var(data, offs)


def test_memoryview_input():
    rows = [b"en", b"en", b"pt", b"", b"en"] * 5
    data, offs = _mk(rows)
    mv = memoryview(data)
    assert encode_dict_var(mv, offs) == _old_encode_dict_var(data, offs)
    assert encode_rle_var(mv, offs) == _old_encode_rle_var(data, offs)


def test_no_per_row_python(monkeypatch):
    """The vectorized paths must never call varbytes_to_objects."""
    def boom(*a, **k):
        raise AssertionError("per-row object path used")
    monkeypatch.setattr(base, "varbytes_to_objects", boom)
    rows = [b"en", b"en", b"pt"] * 10
    data, offs = _mk(rows)
    encode_dict_var(data, offs)
    encode_rle_var(data, offs)
