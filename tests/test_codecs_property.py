"""Property-based round-trip tests for the codec layer (hypothesis).

The pytest suites in test_codecs.py cover hand-picked adversarial cases;
these properties let hypothesis search the space: any int64 array, any
float array (NaN/±inf included), any list of byte strings (non-UTF8,
empty, long) must survive select→encode→decode bit-identically, under
every seed (codec choice must never affect correctness).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from dumpster.chunk import decode_chunk, encode_chunk
from dumpster.codecs import (decode_fixed, decode_var, select_encode_fixed,
                             select_encode_var)
from dumpster.codecs.base import offsets_from_lengths

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(I64, max_size=300), st.integers(0, 2**32 - 1))
def test_fixed_int_roundtrip(vals, seed):
    arr = np.array(vals, dtype=np.int64)
    codec, zl, payload, meta, _ = select_encode_fixed(arr, seed)
    out = decode_fixed(codec, zl, payload, meta, len(arr))
    assert out.dtype == np.int64
    assert np.array_equal(out, arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=200),
       st.integers(0, 2**32 - 1))
def test_fixed_float_roundtrip_bitwise(vals, seed):
    arr = np.array(vals, dtype=np.float64)
    codec, zl, payload, meta, _ = select_encode_fixed(arr, seed)
    out = decode_fixed(codec, zl, payload, meta, len(arr))
    # bitwise equality: NaN payload bits must survive too
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=400), max_size=120),
       st.integers(0, 2**32 - 1))
def test_var_bytes_roundtrip(items, seed):
    data = b"".join(items)
    offsets = offsets_from_lengths(
        np.array([len(b) for b in items], dtype=np.int64))
    codec, zl, payload, meta, _ = select_encode_var(data, offsets, seed)
    out_data, out_offs = decode_var(codec, zl, payload, meta, len(items))
    assert bytes(out_data) == data
    assert np.array_equal(out_offs, offsets)


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.tuples(st.one_of(st.none(), st.binary(max_size=60)),
              st.one_of(st.none(), I64),
              st.one_of(st.none(), st.text(max_size=30))),
    max_size=80),
    st.integers(0, 10**6))
def test_chunk_roundtrip_with_nulls(rows, seq):
    batch = pa.RecordBatch.from_arrays(
        [pa.array([r[0] for r in rows], type=pa.binary()),
         pa.array([r[1] for r in rows], type=pa.int64()),
         pa.array([r[2] for r in rows], type=pa.string())],
        names=["b", "i", "s"])
    blob, _ = encode_chunk(batch, table_id="prop", bucket=0, chunk_seq=seq)
    out = decode_chunk(blob)

    def ipc(b):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        return sink.getvalue().to_pybytes()

    assert ipc(out) == ipc(batch)


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.tuples(st.one_of(st.none(), st.binary(max_size=60)),
              st.one_of(st.none(), I64),
              st.one_of(st.none(), st.text(max_size=30))),
    max_size=80),
    st.sets(st.sampled_from(["b", "i", "s"]), min_size=1),
    st.integers(0, 10**6))
def test_ranged_file_read_equals_in_memory_pruned_decode(rows, cols, seq):
    """decode_chunk_file's ranged reads must agree with the in-memory
    pruned decode for every column subset, including all-null columns."""
    import pathlib
    import tempfile

    from dumpster.chunk import decode_chunk_file

    batch = pa.RecordBatch.from_arrays(
        [pa.array([r[0] for r in rows], type=pa.binary()),
         pa.array([r[1] for r in rows], type=pa.int64()),
         pa.array([r[2] for r in rows], type=pa.string())],
        names=["b", "i", "s"])
    blob, _ = encode_chunk(batch, table_id="prop", bucket=0, chunk_seq=seq)
    fp = pathlib.Path(tempfile.mkdtemp(prefix="dm_rng_")) / "c.dmc"
    fp.write_bytes(blob)
    want = sorted(cols)
    a = decode_chunk(blob, columns=want)
    br = []
    b = decode_chunk_file(str(fp), columns=want, bytes_read=br)

    def ipc(x):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, x.schema) as w:
            w.write_batch(x)
        return sink.getvalue().to_pybytes()

    assert ipc(a) == ipc(b)
    assert br[0] <= len(blob) + 1


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.tuples(
        st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True,
                                       width=32)),
        st.one_of(st.none(), st.decimals(min_value=-10**15, max_value=10**15,
                                         places=4)),
        st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32),
                 max_size=6),
        st.lists(st.binary(max_size=12), max_size=4)),
    max_size=50),
    st.integers(0, 10**6))
def test_full_type_surface_chunk_roundtrip(rows, seq):
    """float32 (NaN/inf bits), decimal128, list<float>, list<binary> — the
    whole extended type surface through one chunk, any selector seed."""
    import decimal

    batch = pa.RecordBatch.from_arrays(
        [pa.array([r[0] for r in rows], type=pa.float32()),
         pa.array([None if r[1] is None else r[1].quantize(
             decimal.Decimal("0.0001")) for r in rows],
             type=pa.decimal128(20, 4)),
         pa.array([r[2] for r in rows], type=pa.list_(pa.float32())),
         pa.array([r[3] for r in rows], type=pa.list_(pa.binary()))],
        names=["f32", "dec", "emb", "blobs"])
    blob, _ = encode_chunk(batch, table_id="prop_full", bucket=1,
                           chunk_seq=seq)
    out = decode_chunk(blob)

    def ipc(b):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        return sink.getvalue().to_pybytes()

    assert ipc(out) == ipc(batch)
