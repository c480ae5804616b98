"""Pin tests: the vectorized doc_fingerprint / simhash64 must return the
exact values of the round-1 per-row implementations (the round-1 verdict
required vectorization with identical outputs), and md5vec must be
bit-exact MD5."""

import hashlib

import numpy as np
import pandas as pd
import pytest

import dumpster.textops as textops
from dumpster.md5vec import md5_lsb8

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    None,
    "a",
    " ",
    "the the the the",
    "café naïve 中文 \U0001F600 mixed unicode",
    "x" * 200,
    ("tok" + "q" * 60) + " short",   # >55-byte token → hashlib fallback lane
    "word " * 500,
    "double  space\ttab",
]

# values produced by the round-1 per-row implementations — frozen
FP_PINS = [1853068276166742511, 0, -1, 97, 32, 704711922935138881,
           379770576131378815, 1598680615994926548, 156911968174008830,
           499676159242321127, 1905824756948213577]
SIM_PINS = [-3574015537522617329, 0, 0, -6289574019528802036,
            338333539836370388, -2637251346890439537, -305877993446984913,
            -350624576684251088, 9137799108346153327, -7651679094314598972,
            357473493446335968]


def test_doc_fingerprint_pinned():
    got = textops.doc_fingerprint.func(pd.Series(CORPUS, dtype=object))
    assert got.tolist() == FP_PINS


def test_simhash64_pinned():
    got = textops.simhash64.func(pd.Series(CORPUS, dtype=object))
    assert got.tolist() == SIM_PINS


def _fp_ref(s):
    if s is None:
        return -1
    h = 0
    for b in s.encode("utf-8", "surrogatepass"):
        h = (h * textops.POLY + b) % textops.MOD
    return h


def test_fingerprint_fuzz_matches_per_row_definition():
    rng = np.random.default_rng(11)
    words = ["the", "of", "fox", "a", "café", "x" * 30, "zzz", "1", ""]
    docs = [" ".join(rng.choice(words, size=rng.integers(1, 50)).tolist())
            for _ in range(200)] + [None, "", "   "]
    s = pd.Series(docs, dtype=object)
    assert textops.doc_fingerprint.func(s).tolist() == [_fp_ref(d) for d in docs]
    assert textops.simhash64.func(s).tolist() == \
        [textops._simhash_one(d) for d in docs]


def test_md5vec_bit_exact_every_single_block_length():
    rng = np.random.default_rng(3)
    msgs = []
    for length in range(0, 56):
        for _ in range(3):
            msgs.append(rng.integers(0, 256, size=length,
                                     dtype=np.uint8).tobytes())
    for length in (56, 64, 100, 1000):   # multi-block fallback
        msgs.append(rng.integers(0, 256, size=length,
                                 dtype=np.uint8).tobytes())
    data = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    offs = np.zeros(len(msgs) + 1, dtype=np.int64)
    offs[1:] = np.cumsum([len(m) for m in msgs])
    got = md5_lsb8(data, offs)
    want = np.array([int.from_bytes(hashlib.md5(m).digest()[:8], "little")
                     for m in msgs], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_no_per_token_python_in_hot_path():
    """Structural guard: the hot path must not call hashlib per token —
    a 100k-token batch with all tokens ≤ 55 bytes must never enter the
    fallback loop."""
    calls = []
    orig = hashlib.md5

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    docs = pd.Series(["alpha beta gamma delta " * 50] * 100, dtype=object)
    try:
        hashlib.md5 = spy
        textops.simhash64.func(docs)
    finally:
        hashlib.md5 = orig
    assert calls == []


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, (1 << 61) - 2), min_size=1, max_size=50),
       st.integers(0, (1 << 61) - 2))
def test_modmul61_matches_python_bigints(avals, b):
    import numpy as np
    from dumpster.textops import _modmul61, MOD
    a = np.array(avals, dtype=np.uint64)
    got = _modmul61(a, np.uint64(b))
    want = [(int(x) * b) % MOD for x in avals]
    assert got.tolist() == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=80), min_size=1, max_size=40))
def test_md5vec_fuzz_bit_exact(msgs):
    import hashlib
    import numpy as np
    from dumpster.md5vec import md5_lsb8
    data = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    offs = np.zeros(len(msgs) + 1, dtype=np.int64)
    offs[1:] = np.cumsum([len(m) for m in msgs])
    got = md5_lsb8(data, offs)
    want = np.array([int.from_bytes(hashlib.md5(m).digest()[:8], "little")
                     for m in msgs], dtype=np.uint64)
    assert np.array_equal(got, want)
