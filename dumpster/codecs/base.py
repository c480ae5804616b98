"""Codec primitives shared by every codec: bit-packing, var-width buffers.

All codecs are pure NumPy/bytes functions — no Spark, no JVM — so they unit
test in microseconds and run vectorized inside Arrow UDFs.  This replaces
the reference's delegation of encoding to parquet-avro
(reference: RecordWriter.java:27-34 builds an AvroParquetWriter with
dictionary encoding + Snappy; here the encodings are first-class).

Two value shapes flow through the codec layer:

* fixed-width: a ``np.ndarray`` of int64 / float64 / bool (timestamps are
  int64 microseconds; the Arrow type is restored at the chunk layer).
* var-width:  a ``(data: bytes, offsets: np.int64[n+1])`` pair for
  string / binary columns — offsets index into ``data``; this mirrors the
  Arrow layout so the hot path never materialises per-row Python objects.

Codec contract (duck-typed, see each module):
    encode_*(...) -> (payload: bytes, meta: dict)
    decode_*(payload, meta, n) -> values in the same shape
``meta`` must be JSON-serialisable and small (scalars only).
"""

from __future__ import annotations

import numpy as np

# --- codec ids (stable on disk — never renumber) -------------------------
PLAIN = 0
DICT = 1
RLE = 2
FOR = 3          # frame-of-reference + bit-pack
DELTA_FOR = 4    # delta, then frame-of-reference + bit-pack
FSST = 5
BSS = 6          # byte-stream split (per-byte planes; wins via zlib stage)

CODEC_NAMES = {PLAIN: "plain", DICT: "dict", RLE: "rle", FOR: "for",
               DELTA_FOR: "delta_for", FSST: "fsst", BSS: "bss"}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}


# --- bit-packing ----------------------------------------------------------

def bit_width(max_val: int) -> int:
    """Bits needed to represent values in [0, max_val]; 0 for max_val==0."""
    return int(max_val).bit_length() if max_val > 0 else 0


def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints (uint64 view) at ``width`` bits each, LSB-first.

    Vectorized: explodes each value into its bits (n, width) and packbits.
    width==0 means all-zero values → empty payload.
    """
    if width == 0 or len(vals) == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitunpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`bitpack` → uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


# --- frame-of-reference on raw uint64 (modular, exact for any int64) ------

def for_pack_u64(vals_u64: np.ndarray) -> tuple[bytes, int, int]:
    """FOR-pack a uint64 array: subtract min (mod 2^64), bit-pack residuals.

    Returns (payload, base_as_python_int, width).  Exact for any int64
    column viewed as uint64 because subtraction/addition are modular.
    """
    v = np.ascontiguousarray(vals_u64, dtype=np.uint64)
    if len(v) == 0:
        return b"", 0, 0
    base = int(v.min())
    resid = v - np.uint64(base)
    width = bit_width(int(resid.max()))
    return bitpack(resid, width), base, width


def for_unpack_u64(payload: bytes, n: int, base: int, width: int) -> np.ndarray:
    resid = bitunpack(payload, n, width)
    return resid + np.uint64(base)


# --- var-width (string/binary) buffer helpers -----------------------------

def lengths_from_offsets(offsets: np.ndarray) -> np.ndarray:
    return np.diff(offsets.astype(np.int64))


def offsets_from_lengths(lengths: np.ndarray) -> np.ndarray:
    out = np.empty(len(lengths) + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(lengths, out=out[1:])
    return out


def pack_lengths(lengths: np.ndarray) -> tuple[bytes, dict]:
    """FOR-bitpack a lengths array (always non-negative)."""
    payload, base, width = for_pack_u64(lengths.astype(np.uint64))
    return payload, {"lb": base, "lw": width, "ln": int(len(lengths))}


def unpack_lengths(payload: bytes, meta: dict) -> np.ndarray:
    return for_unpack_u64(payload, meta["ln"], meta["lb"], meta["lw"]).astype(np.int64)


def varbytes_to_objects(data: bytes, offsets: np.ndarray) -> np.ndarray:
    """(data, offsets) → object ndarray of bytes (for np.unique / compares)."""
    n = len(offsets) - 1
    out = np.empty(n, dtype=object)
    mv = memoryview(data)
    off = offsets
    for i in range(n):
        out[i] = bytes(mv[off[i]:off[i + 1]])
    return out


def objects_to_varbytes(objs) -> tuple[bytes, np.ndarray]:
    """Iterable of bytes → (data, offsets)."""
    lengths = np.fromiter((len(o) for o in objs), dtype=np.int64,
                          count=len(objs))
    return b"".join(objs), offsets_from_lengths(lengths)
