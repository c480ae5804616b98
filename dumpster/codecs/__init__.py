"""Pure-NumPy lightweight compression codecs + sampling auto-selector."""

from .base import (CODEC_IDS, CODEC_NAMES, DELTA_FOR, DICT, FOR, FSST, PLAIN,
                   RLE)
from .selector import (decode_fixed, decode_var, select_encode_fixed,
                       select_encode_var, stable_seed)

__all__ = [
    "PLAIN", "DICT", "RLE", "FOR", "DELTA_FOR", "FSST",
    "CODEC_NAMES", "CODEC_IDS",
    "select_encode_fixed", "select_encode_var",
    "decode_fixed", "decode_var", "stable_seed",
]
